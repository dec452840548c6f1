from .fast_pq import FastPQ, TransformedData, _FastDistanceTable
from .flat import Flat
from .ivf import IVF, tune_n_probes

__all__ = ["FastPQ", "TransformedData", "_FastDistanceTable", "Flat", "IVF", "tune_n_probes"]

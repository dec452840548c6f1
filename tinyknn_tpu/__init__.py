"""tinyknn_tpu — a TPU-native approximate nearest-neighbor framework.

Same capabilities as thomasahle/tinyknn (4-bit product quantization +
inverted-file search with exact rescore), re-designed for TPU:
JAX/XLA/Pallas compute, batched queries, MXU int8 scans, mesh-sharded
indexes. See tinyknn_tpu/models for the index classes, tinyknn_tpu/ops
for the kernels, tinyknn_tpu/parallel for multi-chip sharding.
"""

from . import ops, utils
from .models import IVF, FastPQ, Flat, TransformedData
from .utils import (
    bottom_k,
    bottom_k_2d,
    cdist,
    group_data_by_indices,
    knn_brute,
    knn_brute1,
    pad1,
    pad2,
)

__version__ = "0.1.0"

__all__ = [
    "IVF", "FastPQ", "Flat", "TransformedData",
    "bottom_k", "bottom_k_2d", "cdist", "group_data_by_indices",
    "knn_brute", "knn_brute1", "pad1", "pad2",
    "ops", "utils",
]

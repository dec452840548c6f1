"""Build-probe / query-probe interaction contracts.

Contract mirrored from the reference's multiprobe suite (reference:
tests/test_multiprobe.py): recall@10 is (softly, -0.1 tolerance)
monotone in both the build-time spill factor and the query-time probe
count, and saturates >= 0.9 once either side probes deep enough. The
structure here is batched-first: ONE index per build_probes level
serves every query-probe measurement (the per-query rebuild loop of a
CPU library has no reason to exist when query() takes the whole (Q, d)
batch), and monotonicity is asserted with array diffs over the measured
grid rather than element-by-element loops.
"""

import numpy as np
import pytest

from tinyknn_tpu import FastPQ, IVF, knn_brute

K = 10
GRID = (1, 2, 3, 4)  # build_probes x query_probes levels under test

rng = np.random.default_rng(10)
POINTS = rng.standard_normal((1000, 10)).astype(np.float32)
QUERIES = rng.standard_normal((30, 10)).astype(np.float32)


def _recall_curve(metric, build_probes, query_probe_levels):
    """One built index -> recall@10 at each query-probe level."""
    truth = np.asarray(knn_brute(QUERIES, POINTS, k=K, metric=metric))
    index = IVF(metric, int(len(POINTS) ** 0.5), FastPQ(2))
    index.fit(POINTS).build(POINTS, n_probes=build_probes)
    curve = []
    for qp in query_probe_levels:
        found = np.asarray(index.query(QUERIES, k=K, n_probes=qp))
        hits = sum(np.intersect1d(f, t).size for f, t in zip(found, truth))
        curve.append(hits / truth.size)
    return np.array(curve)


@pytest.mark.parametrize("metric", ["angular", "euclidean"])
def test_probe_monotonicity(metric):
    grid = np.stack([_recall_curve(metric, bp, GRID) for bp in GRID])
    # rows: build_probes levels; cols: query_probes levels
    assert grid.shape == (len(GRID), len(GRID))
    # soft monotonicity along both axes (tolerance matches the
    # reference's contract: k-means seeds move cluster boundaries)
    assert np.diff(grid, axis=0).min() >= -0.1, grid
    assert np.diff(grid, axis=1).min() >= -0.1, grid
    # the deep corner must beat the shallow corner outright
    assert grid[-1, -1] >= grid[0, 0]


@pytest.mark.parametrize("metric", ["angular", "euclidean"])
def test_deep_probe_recall_floor(metric):
    # probing deep on either side reaches 0.9 recall@10
    deep_query = _recall_curve(metric, 4, (10,))[0]
    deep_build = _recall_curve(metric, 10, (4,))[0]
    assert deep_query >= 0.9, deep_query
    assert deep_build >= 0.9, deep_build

"""Multiprobe monotonicity + high-probe recall (reference: tests/test_multiprobe.py)."""

import numpy as np
import pytest

from tinyknn_tpu import FastPQ, IVF, knn_brute

np.random.seed(10)

n = 1000
d = 10
nq = 30
at = 10

X = np.random.randn(n, d).astype(np.float32)
qs = np.random.randn(nq, d).astype(np.float32)


def compute_recall(metric, build_probes, query_probes):
    trus = np.asarray(knn_brute(qs, X, k=at, metric=metric))
    ivf = IVF(metric, int(n**0.5), FastPQ(2))
    ivf.fit(X).build(X, n_probes=build_probes)
    guesses = np.asarray(ivf.query(qs, k=at, n_probes=query_probes))
    recall_at = sum(
        len(set(g.tolist()) & set(t.tolist()))
        for g, t in zip(guesses, trus))
    return recall_at / nq / at


@pytest.mark.parametrize("metric", ["angular", "euclidean"])
def test_monotone(metric):
    m = 4
    table = []
    for build_probes in range(1, m + 1):
        table.append([])
        for query_probes in range(1, m + 1):
            table[-1].append(compute_recall(metric, build_probes,
                                            query_probes))
    for row in table:
        print(row)
    for i in range(1, m):
        for j in range(m):
            assert table[i][j] >= table[i - 1][j] - 0.1
    for i in range(m):
        for j in range(1, m):
            assert table[i][j] >= table[i][j - 1] - 0.1


@pytest.mark.parametrize("metric", ["angular", "euclidean"])
def test_good(metric):
    assert compute_recall(metric, build_probes=4, query_probes=10) >= .9
    assert compute_recall(metric, build_probes=10, query_probes=4) >= .9

"""Utils vs NumPy oracles (reference test family: tests/test_utils.py)."""

import numpy as np
import pytest
from itertools import product

from tinyknn_tpu import cdist, knn_brute, group_data_by_indices
from tinyknn_tpu.utils import invert_assignments, invert_assignments_csr

np.random.seed(10)


def test_cdist():
    n1, n2, d = 10, 8, 5
    X = np.random.randn(n1, d)
    Y = np.random.randn(n2, d)
    dists = np.asarray(cdist(X, Y))
    for i in range(n1):
        for j in range(n2):
            tru = np.sum((X[i] - Y[j]) ** 2)
            assert np.isclose(dists[i, j], tru, atol=1e-4)


@pytest.mark.parametrize("n1, n2, d, k", product([40], [28], [5], [1, 10, 28]))
def test_brute(n1, n2, d, k):
    X = np.random.randn(n1, d)
    Y = np.random.randn(n2, d)
    d2 = np.asarray(cdist(X, Y))
    if k < n2:
        expected = d2.argpartition(axis=1, kth=k)[:, :k]
    else:
        expected = np.broadcast_to(np.arange(n2), (n1, n2))
    best = np.asarray(knn_brute(X, Y, k))
    assert np.all(np.sort(expected) == np.sort(best))


def test_brute_chunked():
    X = np.random.randn(100, 4)
    Y = np.random.randn(30, 4)
    a = np.asarray(knn_brute(X, Y, 5, chunk=16))
    b = np.asarray(knn_brute(X, Y, 5, chunk=100000))
    np.testing.assert_array_equal(a, b)


def test_angular():
    n1, n2, d = 40, 28, 5
    X = np.random.randn(n1, d)
    Y = np.random.randn(n2, d)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Y /= np.linalg.norm(Y, axis=1, keepdims=True)
    angular = np.asarray(knn_brute(X, Y, 10, metric="angular"))
    euclidean = np.asarray(knn_brute(X, Y, 10, metric="euclidean"))
    assert np.all(np.sort(angular) == np.sort(euclidean))


def test_group_data_by_indices():
    N, d, c, k = 100, 5, 6, 3
    X = np.random.rand(N, d)
    Q = np.random.randn(c, d)
    indices = np.argpartition(-X @ Q.T, k, axis=1)[:, :k]
    parts, _ = group_data_by_indices(X, indices, c)
    for i in range(c):
        mask = np.any(indices == i, axis=1)
        A = parts[i]
        B = X[mask]
        np.testing.assert_allclose(
            A[np.lexsort(A.T)], B[np.lexsort(B.T)])


def test_invert_assignments():
    N, c, p = 200, 7, 3
    assignments = np.random.randint(0, c, size=(N, p))
    ids, counts = invert_assignments(assignments, c)
    assert ids.shape[0] == c
    # Every (point, list) pair appears exactly once
    for lst in range(c):
        members = ids[lst][ids[lst] >= 0]
        expected = np.unique(np.where((assignments == lst).any(axis=1))[0])
        got_counts = np.bincount(members, minlength=N)
        # each point appears as many times as it assigned itself to lst
        times = (assignments == lst).sum(axis=1)
        np.testing.assert_array_equal(got_counts, times)
        assert counts[lst] == times.sum()
        assert set(members) == set(expected)


def test_invert_assignments_csr_matches_dense():
    N, c, p = 150, 5, 2
    assignments = np.random.randint(0, c, size=(N, p))
    ids, counts = invert_assignments(assignments, c)
    flat, offsets = invert_assignments_csr(assignments, c)
    for lst in range(c):
        a = np.sort(ids[lst][ids[lst] >= 0])
        b = np.sort(flat[offsets[lst]:offsets[lst + 1]])
        np.testing.assert_array_equal(a, b)


def test_make_clustered_pins_the_recipe():
    """The clustered-dataset generator is load-bearing: the driver
    bench gates recall against truth archives computed on this data,
    so the recipe (rng call order included) must never drift. This
    pins it byte-for-byte against the historical inline form that
    every round-1..5 consumer used."""
    from tinyknn_tpu.utils import make_clustered, truth_cache_path

    size, dim, nq = 5000, 24, 300
    data, queries = make_clustered(size, dim, nq)
    assert data.shape == (size, dim) and queries.shape == (nq, dim)
    assert data.dtype == np.float32 and queries.dtype == np.float32

    # the exact historical recipe (bench.py / examples/bench.py /
    # r5_fix_truth.py pre-consolidation)
    rng = np.random.default_rng(10)
    n_comp = int((size + nq) ** 0.5)
    centers = rng.standard_normal((n_comp, dim), dtype=np.float32)
    which = rng.integers(0, n_comp, size + nq)
    ref = centers[which] + 0.5 * rng.standard_normal(
        (size + nq, dim), dtype=np.float32)
    np.testing.assert_array_equal(data, ref[:-nq])
    np.testing.assert_array_equal(queries, ref[-nq:])

    # truth archive filename contract (what r5_fix_truth.py writes and
    # bench.py loads)
    assert truth_cache_path(1183514, 100, 10, 10000, "angular") == (
        "trus_clustered-1183514-100_k_neighbours=10_num_queries=10000"
        "_metric='angular'.npy")
    assert truth_cache_path(10, 2, 1, 5, "euclidean", cache_dir="/tmp/"
                            ).startswith("/tmp/trus_clustered-10-2")

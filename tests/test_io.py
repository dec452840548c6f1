"""Save/load round-trip tests for index persistence."""

import numpy as np

from tinyknn_tpu import FastPQ, IVF
from tinyknn_tpu.io import load_ivf, load_pq, save_ivf, save_pq

np.random.seed(10)


def test_pq_roundtrip(tmp_path):
    X = np.random.randn(200, 16).astype(np.float32)
    qs = np.random.randn(5, 16).astype(np.float32)
    pq = FastPQ(2, rotate_dim=8)
    data = pq.fit_transform(X)
    path = tmp_path / "pq.npz"
    save_pq(path, pq)
    pq2 = load_pq(path)
    data2 = pq2.transform(X)
    np.testing.assert_array_equal(np.asarray(data.codes),
                                  np.asarray(data2.codes))
    est1 = np.asarray(pq.distance_table(qs).estimate_distances(data))
    est2 = np.asarray(pq2.distance_table(qs).estimate_distances(data2))
    np.testing.assert_array_equal(est1, est2)


def test_ivf_roundtrip(tmp_path):
    X = np.random.randn(300, 12).astype(np.float32)
    qs = np.random.randn(7, 12).astype(np.float32)
    ivf = IVF("angular", 12, FastPQ(2))
    ivf.fit(X).build(X, n_probes=2)
    path = tmp_path / "ivf.npz"
    save_ivf(path, ivf)
    ivf2 = load_ivf(path)
    a = np.asarray(ivf.query(qs, k=5, n_probes=3))
    b = np.asarray(ivf2.query(qs, k=5, n_probes=3))
    np.testing.assert_array_equal(a, b)


def test_ivf_roundtrip_preserves_tuning(tmp_path):
    """Constructor knobs must survive save/load (a tuned index used to
    reload with hardcoded defaults)."""
    X = np.random.randn(200, 12).astype(np.float32)
    ivf = IVF("euclidean", 8,
              FastPQ(2, kmeans_iters=7, kmeans_n_init=1),
              kmeans_iters=11, queries_per_cluster=48,
              pass1_method="exact", scan_impl="xla")
    ivf.fit(X).build(X, n_probes=2)
    path = tmp_path / "ivf_tuned.npz"
    save_ivf(path, ivf)
    ivf2 = load_ivf(path)
    assert ivf2.kmeans_iters == 11
    assert ivf2.queries_per_cluster == 48
    assert ivf2.pass1_method == "exact"
    assert ivf2.scan_impl == "xla"
    assert ivf2.pq.kmeans_iters == 7
    assert ivf2.pq.kmeans_n_init == 1

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


def test_ivf_v2_archive_converts_to_csr(tmp_path):
    """v2 archives stored a dense (C, cap) grid; loading one must
    rebuild the CSR tile layout and query identically."""
    import json
    from tinyknn_tpu.io import _pq_state

    X = np.random.randn(300, 12).astype(np.float32)
    qs = np.random.randn(7, 12).astype(np.float32)
    ivf = IVF("euclidean", 10, FastPQ(2))
    ivf.fit(X).build(X, n_probes=2)
    want = np.asarray(ivf.query(qs, k=5, n_probes=3))

    # synthesize the v2 dense grid from the CSR index
    C = ivf.tile_offsets.shape[0]
    counts = np.asarray(ivf.list_counts)
    toff = np.asarray(ivf.tile_offsets)
    flat_ids = np.asarray(ivf.csr_ids)
    codes_rows = np.asarray(ivf.csr_codes).transpose(0, 2, 1).reshape(
        -1, np.asarray(ivf.csr_codes).shape[1])
    Bs = np.asarray(ivf.pq.center_blocks).shape[0] // 2
    cap = max(8, int(-(-counts.max() // 8) * 8))
    list_codes = np.zeros((C, cap, Bs), np.uint8)
    list_ids = np.full((C, cap), -1, np.int32)
    for c in range(C):
        L, s = int(counts[c]), int(toff[c]) * 128
        list_codes[c, :L] = codes_rows[s:s + L, :Bs]
        list_ids[c, :L] = flat_ids[s:s + L]
    path = tmp_path / "ivf_v2.npz"
    np.savez_compressed(
        path, format=np.int32(2),
        kind=np.frombuffer(b"ivf", np.uint8),
        ivf_meta=np.frombuffer(json.dumps({
            "metric": ivf.metric, "n_clusters": ivf.n_clusters,
            "seed": ivf.seed}).encode(), dtype=np.uint8),
        all_centers=np.asarray(ivf.all_centers),
        active_centers=np.asarray(ivf.active_centers),
        list_codes=list_codes, list_ids=list_ids,
        list_counts=counts.astype(np.int32),
        data=np.asarray(ivf.data), **_pq_state(ivf.pq))

    ivf2 = load_ivf(path)
    got = np.asarray(ivf2.query(qs, k=5, n_probes=3))
    np.testing.assert_array_equal(want, got)
    # pre-v3 meta carries no build_probes: load must derive the exact
    # spill bound from the lists (max multiplicity of any id), not
    # guess a default that could under-size the dedup-aware selection
    assert ivf2.build_probes == 2


def test_ivf_labels_roundtrip(tmp_path):
    X = np.random.randn(250, 12).astype(np.float32)
    qs = np.random.randn(6, 12).astype(np.float32)
    labels = (10**12 + 7) * np.arange(250, dtype=np.int64)
    ivf = IVF("euclidean", 10, FastPQ(2))
    ivf.fit(X).build(X, n_probes=2, labels=labels)
    path = tmp_path / "ivf_labels.npz"
    save_ivf(path, ivf)
    ivf2 = load_ivf(path)
    a = np.asarray(ivf.query(qs, k=5, n_probes=3))
    b = np.asarray(ivf2.query(qs, k=5, n_probes=3))
    assert a.dtype == np.int64 and b.dtype == np.int64
    np.testing.assert_array_equal(a, b)
    assert np.all((a >= 10**12) | (a == -1))


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

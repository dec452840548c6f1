"""Multi-device sharded IVF tests on the 8-virtual-device CPU mesh.

This is the distributed test family the reference lacks (SURVEY.md §4):
the sharded query must agree with the single-device index, and the
data-parallel Lloyd step must match the serial one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyknn_tpu import FastPQ, IVF, knn_brute
from tinyknn_tpu.parallel import ShardedIVF, lloyd_step_dp, make_mesh

np.random.seed(10)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_matches_single(mesh):
    n, d, nq = 600, 12, 16
    X = np.random.randn(n, d).astype(np.float32)
    qs = np.random.randn(nq, d).astype(np.float32)

    kw = dict(seed=3)
    single = IVF("euclidean", 24, FastPQ(2, seed=7), **kw)
    single.fit(X).build(X, n_probes=2)
    sharded = ShardedIVF("euclidean", 24, FastPQ(2, seed=7), mesh=mesh, **kw)
    sharded.fit(X).build(X, n_probes=2)

    a = np.asarray(single.query(qs, k=8, n_probes=4))
    b = np.asarray(sharded.query(qs, k=8, n_probes=4))
    # Same fitted state (same seeds). The sharded path rescores pass_1
    # candidates PER SHARD (a superset of the single-device global
    # pass_1 cut), so its result can only be equal or better. Contract:
    # high overlap, and the sharded worst-of-k exact distance must not
    # exceed the single-device one.
    overlaps = []
    for i in range(nq):
        overlaps.append(len(set(a[i].tolist()) & set(b[i].tolist())) / 8)
        da = ((X[a[i]] - qs[i]) ** 2).sum(-1).max()
        db = ((X[b[i]] - qs[i]) ** 2).sum(-1).max()
        assert db <= da + 1e-4, (i, da, db)
    assert np.mean(overlaps) >= 0.9, overlaps


def test_sharded_recall_matches_single(mesh):
    n, d, nq, at = 500, 16, 20, 10
    X = np.random.randn(n, d).astype(np.float32)
    qs = np.random.randn(nq, d).astype(np.float32)
    trus = np.asarray(knn_brute(qs, X, k=at))

    def recall_of(cls, **kw):
        ivf = cls("angular", 22, FastPQ(2), **kw)
        ivf.fit(X).build(X, n_probes=4)
        g = np.asarray(ivf.query(qs, k=at, n_probes=10))
        return np.mean([len(set(a.tolist()) & set(t.tolist())) / at
                        for a, t in zip(g, trus)])

    r_single = recall_of(IVF)
    r_sharded = recall_of(ShardedIVF, mesh=mesh)
    # sharding must not cost recall (it can only widen the rescore pool)
    assert r_sharded >= r_single - 1e-9, (r_single, r_sharded)
    assert r_single > 0.5  # sanity floor for this config


def test_lloyd_step_dp_matches_serial(mesh):
    n, d, k = 512, 8, 10
    X = np.random.randn(n, d).astype(np.float32)
    C = X[:k].copy()
    newC, inertia = lloyd_step_dp(jnp.asarray(X), jnp.asarray(C), mesh)
    # serial oracle
    d2 = ((X[:, None] - C[None]) ** 2).sum(-1)
    assign = d2.argmin(1)
    expC = np.stack([X[assign == j].mean(0) if (assign == j).any() else C[j]
                     for j in range(k)])
    np.testing.assert_allclose(np.asarray(newC), expC, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(inertia), d2.min(1).sum(), rtol=1e-4)


def test_sharded_fastpq_matches_single(mesh):
    from tinyknn_tpu.parallel import ShardedFastPQ
    n, d, nq, k = 333, 16, 12, 7
    X = np.random.randn(n, d).astype(np.float32)
    qs = np.random.randn(nq, d).astype(np.float32)

    pq = FastPQ(2, seed=5)
    data = pq.fit_transform(X)
    a = np.asarray(pq.search(qs, data, X, k=k, method="exact"))

    spq = ShardedFastPQ(FastPQ(2, seed=5), mesh=mesh)
    spq.fit(X).build(X)
    b = np.asarray(spq.search(qs, k=k, method="exact"))

    # Per-shard rescore pools are supersets of the single-device pool:
    # dominance + high overlap (same contract as the sharded IVF test).
    overlaps = []
    for i in range(nq):
        da = ((X[a[i]] - qs[i]) ** 2).sum(-1).max()
        db = ((X[b[i]] - qs[i]) ** 2).sum(-1).max()
        assert db <= da + 1e-4, (i, da, db)
        overlaps.append(len(set(a[i].tolist()) & set(b[i].tolist())) / k)
    assert np.mean(overlaps) >= 0.85, overlaps
    assert np.all((b >= 0) & (b < n))


def test_sharded_query_stats_and_skew(mesh):
    """Sharded drops are observable (psum across shards) and the retry
    ladder recovers recall for a skewed near-duplicate batch."""
    n, d, Q = 1200, 12, 300
    X = np.random.randn(n, d).astype(np.float32)
    qs = (X[3] + 0.02 * np.random.randn(Q, d)).astype(np.float32)
    trus = np.asarray(knn_brute(qs, X, k=5))
    sivf = ShardedIVF("euclidean", 24, FastPQ(2), mesh=mesh, seed=3)
    sivf.fit(X).build(X, n_probes=2)
    out, stats = sivf.query(qs, k=5, n_probes=3, with_stats=True)
    assert stats["dropped_probe_pairs"] == 0, stats
    assert stats["total_probe_pairs"] == Q * 3
    g = np.asarray(out)
    recall = np.mean([len(set(a.tolist()) & set(t.tolist())) / 5
                      for a, t in zip(g, trus)])
    assert recall > 0.5, recall


def test_2d_mesh_matches_1d(mesh):
    """queries x clusters 2-D mesh must return the same ids as the 1-D
    cluster-sharded mesh and the single-device index."""
    from tinyknn_tpu.parallel import make_mesh_2d
    n, d, nq = 800, 12, 48
    X = np.random.randn(n, d).astype(np.float32)
    qs = np.random.randn(nq, d).astype(np.float32)

    ivf = IVF("euclidean", 16, FastPQ(2), seed=3,
              queries_per_cluster=64)
    ivf.fit(X).build(X, n_probes=2)
    ref = np.asarray(ivf.query(qs, k=5, n_probes=4, mode="bucket"))

    m2 = make_mesh_2d((2, 4), ("queries", "shards"))
    sivf = ShardedIVF("euclidean", 16, FastPQ(2), mesh=m2,
                      query_axis="queries", seed=3,
                      queries_per_cluster=64)
    sivf.fit(X).build(X, n_probes=2)
    out = np.asarray(sivf.query(qs, k=5, n_probes=4))
    assert out.shape == (nq, 5)
    # same fitted state (same seeds) -> same candidates; compare by
    # exact-distance dominance like test_sharded_matches_single
    ge = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 5
        for a, b in zip(out, ref)])
    assert ge > 0.9, ge

    # non-divisible batch exercises the query padding path
    out2 = np.asarray(sivf.query(qs[:45], k=5, n_probes=4))
    np.testing.assert_array_equal(out2, out[:45])


def test_sharded_save_load_roundtrip(mesh, tmp_path):
    """ShardedIVF persists mesh-shape-independent archives; loading
    onto a different mesh gives identical query results."""
    from tinyknn_tpu.io import load_sharded_ivf, save_ivf
    from tinyknn_tpu.parallel import make_mesh
    n, d, nq = 500, 10, 12
    X = np.random.randn(n, d).astype(np.float32)
    qs = np.random.randn(nq, d).astype(np.float32)
    sivf = ShardedIVF("angular", 12, FastPQ(2), mesh=mesh, seed=1)
    sivf.fit(X).build(X, n_probes=2)
    a = np.asarray(sivf.query(qs, k=5, n_probes=3))
    path = tmp_path / "sivf.npz"
    save_ivf(path, sivf)
    # reload on a smaller mesh (4 devices instead of 8)
    sivf2 = load_sharded_ivf(path, mesh=make_mesh(4))
    b = np.asarray(sivf2.query(qs, k=5, n_probes=3))
    np.testing.assert_array_equal(a, b)
    # and as a plain single-device IVF
    from tinyknn_tpu.io import load_ivf
    ivf3 = load_ivf(path)
    c = np.asarray(ivf3.query(qs, k=5, n_probes=3, mode="bucket"))
    overlap = np.mean([len(set(x.tolist()) & set(y.tolist())) / 5
                       for x, y in zip(a, c)])
    assert overlap > 0.9, overlap


def test_sharded_query_stream_matches_query(mesh):
    """Sharded stream (R batches per dispatch) vs per-batch query —
    angular metric also covers the table-normalization path."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((512, 16)).astype(np.float32)
    qs = rng.standard_normal((2, 48, 16)).astype(np.float32) * 3.0
    sivf = ShardedIVF("angular", 14, FastPQ(2, rotate_dim=None),
                      mesh=mesh, queries_per_cluster=64)
    sivf.fit(X).build(X, n_probes=2)
    stream = np.asarray(sivf.query_stream(qs, k=6, n_probes=4))
    assert stream.shape == (2, 48, 6)
    for i in range(2):
        single = np.asarray(sivf.query(qs[i], k=6, n_probes=4))
        np.testing.assert_array_equal(stream[i], single)


def test_sharded_query_stream_device_out(mesh):
    """device_out=True (pipelined serving over the mesh) returns
    DEVICE arrays with the same positional ids as the host path."""
    import jax
    rng = np.random.default_rng(4)
    X = rng.standard_normal((512, 16)).astype(np.float32)
    qs = rng.standard_normal((2, 48, 16)).astype(np.float32)
    sivf = ShardedIVF("euclidean", 14, FastPQ(2, rotate_dim=None),
                      mesh=mesh, queries_per_cluster=64)
    sivf.fit(X).build(X, n_probes=2)
    host = np.asarray(sivf.query_stream(qs, k=6, n_probes=4))
    out, dropped = sivf.query_stream(qs, k=6, n_probes=4,
                                     device_out=True)
    assert isinstance(out, jax.Array) and isinstance(dropped, jax.Array)
    np.testing.assert_array_equal(np.asarray(out), host)
    assert int(dropped) == 0


def test_sharded_exact_mode(mesh):
    """Cluster-sharded exact mode: true kNN at full probe coverage,
    stream agrees with query, and it matches the single-chip exact
    index."""
    rng = np.random.default_rng(9)
    n, d, nq = 600, 12, 16
    X = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((nq, d)).astype(np.float32)
    trus = np.asarray(knn_brute(qs, X, k=5))

    single = IVF("euclidean", 12, FastPQ(2, seed=7, rotate_dim=None),
                 seed=3, scan_impl="exact")
    single.fit(X).build(X, n_probes=2)
    sharded = ShardedIVF("euclidean", 12,
                         FastPQ(2, seed=7, rotate_dim=None),
                         mesh=mesh, seed=3, scan_impl="exact")
    sharded.fit(X).build(X, n_probes=2)

    # full probe coverage -> exact kNN (f32 rescore removes bf16 ties)
    got = np.asarray(sharded.query(qs, k=5, n_probes=12))
    rec = np.mean([len(set(g.tolist()) & set(t.tolist())) / 5
                   for g, t in zip(got, trus)])
    assert rec >= 0.99, rec

    a = np.asarray(single.query(qs, k=5, n_probes=3))
    b = np.asarray(sharded.query(qs, k=5, n_probes=3))
    overlap = np.mean([len(set(x.tolist()) & set(y.tolist())) / 5
                       for x, y in zip(a, b)])
    assert overlap >= 0.9, overlap

    stream = np.asarray(sharded.query_stream(
        np.stack([qs, qs]), k=5, n_probes=3))
    np.testing.assert_array_equal(stream[0], b)
    np.testing.assert_array_equal(stream[1], b)


def test_sharded_set_scan_impl_after_place(mesh):
    """Switching a PLACED sharded index to exact mode must derive the
    bf16 vector tiles through the per-shard placement — parity with an
    index built with scan_impl='exact' from the start (round-3 review:
    the inherited base derivation produced mis-placed arrays)."""
    rng = np.random.default_rng(11)
    n, d, nq = 600, 12, 16
    X = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((nq, d)).astype(np.float32)

    fresh = ShardedIVF("euclidean", 12,
                       FastPQ(2, seed=7, rotate_dim=None),
                       mesh=mesh, seed=3, scan_impl="exact")
    fresh.fit(X).build(X, n_probes=2)
    switched = ShardedIVF("euclidean", 12,
                          FastPQ(2, seed=7, rotate_dim=None),
                          mesh=mesh, seed=3)
    switched.fit(X).build(X, n_probes=2)
    switched.set_scan_impl("exact")
    a = np.asarray(fresh.query(qs, k=5, n_probes=3))
    b = np.asarray(switched.query(qs, k=5, n_probes=3))
    np.testing.assert_array_equal(a, b)
    # switching away frees the derived tiles and the PQ path works
    switched.set_scan_impl("auto")
    assert switched.csr_vecs is None
    np.asarray(switched.query(qs, k=5, n_probes=3))
    # set_rescore_rows never allocates the (mis-placed) global raw copy
    switched.set_rescore_rows(True)
    assert switched.csr_raw is None


def test_sharded_load_skips_single_device_derived(mesh, tmp_path):
    """load_sharded_ivf must not build or retain single-device derived
    arrays (exact bf16 tiles are derived per-shard by _place; csr_raw
    is never read by the sharded query) — advisor r3."""
    from tinyknn_tpu.io import load_sharded_ivf, save_ivf
    rng = np.random.default_rng(12)
    n, d, nq = 500, 10, 12
    X = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((nq, d)).astype(np.float32)
    sivf = ShardedIVF("euclidean", 12, FastPQ(2, rotate_dim=None),
                      mesh=mesh, seed=1, scan_impl="exact",
                      rescore_rows=True)
    sivf.fit(X).build(X, n_probes=2)
    a = np.asarray(sivf.query(qs, k=5, n_probes=3))
    path = tmp_path / "sivf_exact.npz"
    save_ivf(path, sivf)
    sivf2 = load_sharded_ivf(path, mesh=mesh)
    assert sivf2.csr_raw is None  # never read by the sharded path
    b = np.asarray(sivf2.query(qs, k=5, n_probes=3))
    np.testing.assert_array_equal(a, b)


def test_sharded_query_stream_adaptive_qc(mesh):
    """The sharded stream self-tunes its per-shard bucket capacities
    exactly like the single-chip stream (models/ivf.py adaptive_qc): a
    skewed stream that drops (query, probe) pairs under the raw
    mean-load heuristic scans drop-free by default, and the result
    matches query()'s escalated output."""
    np.random.seed(41)
    n, d, Q = 3000, 16, 64
    X = np.random.randn(n, d).astype(np.float32)
    qs = (X[13] + 0.02 * np.random.randn(2, Q, d)).astype(np.float32)
    sivf = ShardedIVF("euclidean", 24, FastPQ(2, rotate_dim=None),
                      mesh=mesh, seed=3)
    sivf.fit(X).build(X, n_probes=2)

    # the scenario bites: the heuristic alone drops pairs on this batch
    _, st_raw = sivf.query_stream(qs, k=8, n_probes=3, with_stats=True,
                                  adaptive_qc=False)
    assert st_raw["dropped_probe_pairs"] > 0, st_raw

    out, st = sivf.query_stream(qs, k=8, n_probes=3, with_stats=True)
    assert st["dropped_probe_pairs"] == 0, st
    assert (Q, 3) in sivf._stream_qc_floors  # floor cached per shape
    for i in range(2):
        single = np.asarray(sivf.query(qs[i], k=8, n_probes=3))
        np.testing.assert_array_equal(np.asarray(out)[i], single)


def test_sharded_query_stream_adaptive_drift_escalation(mesh):
    """Query drift past a cached sharded floor: the overflowing stream
    reports drops via the psum'd counter and re-measures the cached
    floor so the next same-shape stream is clean."""
    np.random.seed(42)
    n, d, Q = 3000, 16, 64
    X = np.random.randn(n, d).astype(np.float32)
    qs = (X[13] + 0.02 * np.random.randn(1, Q, d)).astype(np.float32)
    sivf = ShardedIVF("euclidean", 24, FastPQ(2, rotate_dim=None),
                      mesh=mesh, seed=3)
    sivf.fit(X).build(X, n_probes=2)
    # seed the cache with a stale (too-low) floor, as if earlier
    # streams at this shape had been uniform
    sivf._stream_qc_floors = {(Q, 3): (8, 8)}
    _, st1 = sivf.query_stream(qs, k=8, n_probes=3, with_stats=True)
    assert st1["dropped_probe_pairs"] > 0, st1
    assert sivf._stream_qc_floors[(Q, 3)][0] > 8  # refreshed for next
    _, st2 = sivf.query_stream(qs, k=8, n_probes=3, with_stats=True)
    assert st2["dropped_probe_pairs"] == 0, st2

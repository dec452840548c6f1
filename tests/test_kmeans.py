"""KMeans quality tests — recall floors downstream depend on these."""

import jax
import numpy as np

from tinyknn_tpu.ops import blockwise_kmeans, kmeans_fit

np.random.seed(10)


def test_recovers_separated_clusters():
    # 4 well-separated blobs; kmeans with k=4 must find all of them.
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    X = (centers[np.random.randint(0, 4, 400)]
         + 0.1 * np.random.randn(400, 2)).astype(np.float32)
    C, inertia = kmeans_fit(X, 4, iters=20)
    C = np.asarray(C)
    # every true center has a learned center within 0.5
    d = np.sqrt(((C[:, None] - centers[None]) ** 2).sum(-1))
    assert d.min(axis=0).max() < 0.5
    assert float(inertia) < 0.1**2 * 2 * 400 * 2


def test_inertia_decreases_with_k():
    X = np.random.randn(500, 8).astype(np.float32)
    _, i4 = kmeans_fit(X, 4, iters=15)
    _, i16 = kmeans_fit(X, 16, iters=15)
    assert float(i16) < float(i4)


def test_blockwise_shapes_and_quality():
    B, n, dpb = 5, 512, 2
    cols = np.random.randn(B, n, dpb).astype(np.float32)
    C = blockwise_kmeans(jax.random.PRNGKey(0), cols, k=16, iters=15,
                         n_init=2)
    C = np.asarray(C)
    assert C.shape == (B, 16, dpb)
    # Quantization MSE per block should beat a random-16-points codebook
    for b in range(B):
        d2 = ((cols[b][:, None] - C[b][None]) ** 2).sum(-1).min(1)
        rand_code = cols[b][:16]
        d2r = ((cols[b][:, None] - rand_code[None]) ** 2).sum(-1).min(1)
        assert d2.mean() < d2r.mean()


def test_determinism():
    X = np.random.randn(300, 4).astype(np.float32)
    C1, _ = kmeans_fit(X, 8, key=jax.random.PRNGKey(3), iters=10)
    C2, _ = kmeans_fit(X, 8, key=jax.random.PRNGKey(3), iters=10)
    np.testing.assert_array_equal(np.asarray(C1), np.asarray(C2))


def test_tiny_n():
    # n < k: duplicated/degenerate centers are fine, must not crash.
    X = np.random.randn(3, 4).astype(np.float32)
    C, _ = kmeans_fit(X, 8, iters=5)
    assert np.asarray(C).shape == (8, 4)
    assert np.all(np.isfinite(np.asarray(C)))


def test_empty_cluster_relocation():
    """k near-duplicate groups + k >> distinct modes: every cluster must
    end non-empty (sklearn-style relocation to far points)."""
    import jax
    import jax.numpy as jnp
    from tinyknn_tpu.ops.kmeans import kmeans_fit

    rng = np.random.default_rng(5)
    # 3 tight modes, but ask for 12 clusters: naive Lloyd leaves many
    # centers starving while far outliers stay unsplit
    modes = rng.standard_normal((3, 8)).astype(np.float32) * 10
    X = np.concatenate([m + 0.01 * rng.standard_normal((50, 8))
                        for m in modes]).astype(np.float32)
    X[:4] += 100.0  # far outliers relocation should capture
    C, _ = kmeans_fit(X, 12, key=jax.random.PRNGKey(0), iters=20)
    d2 = ((X[:, None, :] - np.asarray(C)[None]) ** 2).sum(-1)
    counts = np.bincount(d2.argmin(1), minlength=12)
    assert (counts > 0).sum() >= 10, counts
    # the outliers must have a nearby center (relocation target)
    assert d2[:4].min(1).max() < 50.0, d2[:4].min(1)

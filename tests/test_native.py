"""Native C++ runtime vs NumPy-fallback equivalence."""

import numpy as np
import pytest

from tinyknn_tpu.native import get_lib, invert_assignments_native, read_fvecs
from tinyknn_tpu.utils.grouping import invert_assignments

np.random.seed(10)


def test_native_grouping_matches_numpy():
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    for n, c, p in [(500, 13, 3), (64, 5, 1), (1000, 31, 2)]:
        a = np.random.randint(0, c, size=(n, p)).astype(np.int32)
        ids_n, counts_n = invert_assignments_native(a, c)
        ids_p, counts_p = invert_assignments(a, c, use_native=False)
        np.testing.assert_array_equal(counts_n, counts_p)
        np.testing.assert_array_equal(ids_n, ids_p)


def test_fvecs_roundtrip(tmp_path):
    n, d = 37, 12
    X = np.random.randn(n, d).astype(np.float32)
    path = tmp_path / "t.fvecs"
    with open(path, "wb") as f:
        for row in X:
            np.int32(d).tofile(f)
            row.tofile(f)
    out = read_fvecs(path)
    np.testing.assert_array_equal(out, X)
    # numpy fallback parity
    import tinyknn_tpu.native as nat
    old = nat._LIB, nat._TRIED
    nat._LIB, nat._TRIED = None, True
    try:
        out2 = read_fvecs(path)
    finally:
        nat._LIB, nat._TRIED = old
    np.testing.assert_array_equal(out2, X)


def test_native_csr_tiled_matches_numpy():
    """The production build path's native counting-sort scatter must
    be bit-identical to the NumPy argsort builder (including empty
    lists, spill columns, and align_tiles kernel-step alignment)."""
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    from tinyknn_tpu.utils.grouping import invert_assignments_csr_tiled
    rng = np.random.default_rng(4)
    for n, c, p, at in [(500, 13, 3, 1), (64, 5, 1, 2), (1000, 31, 2, 1)]:
        # skew so some lists are empty and one exceeds a tile
        probs = rng.random(c) ** 3
        probs /= probs.sum()
        a = rng.choice(c, size=(n, p), p=probs).astype(np.int32)
        got = invert_assignments_csr_tiled(a, c, align_tiles=at)
        want = invert_assignments_csr_tiled(a, c, align_tiles=at,
                                            use_native=False)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

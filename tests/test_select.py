"""Pool-selection and exact-mode width-derivation unit tests.

The encoded-domain selection is the round-3 hot path: its bitcast
trick (int32 fold encodings viewed as IEEE f32 bits) must preserve
order EXACTLY, including at the sentinel and headroom boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinyknn_tpu.models.ivf import (
    ENC_INVALID, _exact_widths, _fold_tiles, _select_pool_enc)

np.random.seed(11)


def _mk_pool(Q, P0, S0, P1, S1, n_rows, col_bits, hi=1 << 18):
    """Random valid encodings + sentinel padding, shaped like the two
    scan rounds' fold buffers."""
    rng = np.random.default_rng(7)
    mask = (1 << col_bits) - 1

    def enc(shape):
        vals = rng.integers(0, hi, shape).astype(np.int64)
        pos = rng.integers(0, mask + 1, shape).astype(np.int64)
        e = (vals << col_bits) | pos
        # sprinkle invalid entries
        inv = rng.random(shape) < 0.1
        return np.where(inv, ENC_INVALID, e).astype(np.int32)

    p0 = enc((Q, P0, S0))
    p1 = enc((Q, P1, S1))
    b0 = rng.integers(0, n_rows - mask - 1, (Q, P0)).astype(np.int32)
    b1 = rng.integers(0, n_rows - mask - 1, (Q, P1)).astype(np.int32)
    ids = rng.integers(0, 10**6, n_rows).astype(np.int32)
    return ([jnp.asarray(p0), jnp.asarray(p1)],
            [jnp.asarray(b0), jnp.asarray(b1)], jnp.asarray(ids))


def test_bitcast_select_matches_exact_topk():
    """method='approx' (bitcast approx_max_k; exact top_k on CPU's
    lowering) must select the same ENCODING SET as int32 top_k."""
    Q, col_bits, p1 = 16, 12, 37
    pools, bases, ids = _mk_pool(Q, 1, 96, 5, 32, 5000, col_bits)
    ca, ra, ea = _select_pool_enc(pools, bases, p1, "approx",
                                  col_bits, ids)
    ce, re_, ee = _select_pool_enc(pools, bases, p1, "exact",
                                   col_bits, ids)
    # encodings are unique with high probability -> compare as sets
    for q in range(Q):
        sa = sorted(np.asarray(ea[q]).tolist())
        se = sorted(np.asarray(ee[q]).tolist())
        assert sa == se, q
    # decoded rows/ids agree after aligning by encoding order
    order_a = np.argsort(np.asarray(ea), axis=1)
    order_e = np.argsort(np.asarray(ee), axis=1)
    np.testing.assert_array_equal(
        np.take_along_axis(np.asarray(ra), order_a, 1),
        np.take_along_axis(np.asarray(re_), order_e, 1))
    np.testing.assert_array_equal(
        np.take_along_axis(np.asarray(ca), order_a, 1),
        np.take_along_axis(np.asarray(ce), order_e, 1))


def test_bitcast_select_headroom_boundary():
    """Encodings at/above 0x7F800000 (would view as inf/NaN) must not
    scramble the selection of the valid range below them."""
    Q, S, p1 = 4, 64, 8
    pool = np.full((Q, 1, S), ENC_INVALID, np.int32)
    # valid encodings spanning the safe range, plus entries in the
    # unsafe sliver [0x7F800000, 0x7FFFFFFE] (bitcast inf/NaN) that
    # must be clamped out rather than scrambling the sort
    pool[:, 0, 0] = 5
    pool[:, 0, 1] = 100
    pool[:, 0, 2] = 0x7F7FFFFF                    # top of safe range
    pool[:, 0, 3] = 7
    pool[:, 0, 4] = 0x7F800000                    # unsafe sliver
    pool[:, 0, 5] = 0x7FFFFFFE
    base = np.zeros((Q, 1), np.int32)
    ids = np.arange(100000, dtype=np.int32)
    cand, rows, enc = _select_pool_enc(
        [jnp.asarray(pool)], [jnp.asarray(base)], p1, "approx",
        16, jnp.asarray(ids))
    got = np.asarray(enc)[0].tolist()
    assert got[:4] == [5, 7, 100, 0x7F7FFFFF], got
    # sliver + sentinel entries all come back as the invalid sentinel
    assert all(g == ENC_INVALID for g in got[4:]), got
    assert np.all(np.asarray(cand)[0, 4:] == -1)


def test_select_decode_ids_deferred():
    """decode_ids=False returns rows/encodings identical to the
    decoded variant, with cand=None."""
    Q, col_bits, p1 = 8, 10, 21
    pools, bases, ids = _mk_pool(Q, 1, 64, 3, 32, 4000, col_bits)
    c1, r1, e1 = _select_pool_enc(pools, bases, p1, "approx",
                                  col_bits, ids)
    c2, r2, e2 = _select_pool_enc(pools, bases, p1, "approx",
                                  col_bits, ids, decode_ids=False)
    assert c2 is None
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_exact_widths_properties():
    mult, max_tiles, k = 8, 18, 10
    # affordable: round-0 gets the full longest list
    r, r_tail, p1 = _exact_widths(mult, max_tiles, 1087, 232, 32, k,
                                  None)
    assert _fold_tiles(r, max_tiles, mult) == max_tiles
    assert p1 == 4 * k
    # default sliver scales linearly with n_probes (bf16
    # selection-boundary ties grow with scanned lists)
    for P, want in ((1, 4 * k), (2, 8 * k), (3, 12 * k), (10, 40 * k)):
        _, _, p1_p = _exact_widths(mult, max_tiles, 1087, 232, 32, k,
                                   None, n_probes=P)
        assert p1_p == want, (P, p1_p)
    # explicit pass_1 still wins over the scaled default
    _, _, p1_u = _exact_widths(mult, max_tiles, 1087, 232, 32, k, 60,
                               n_probes=10)
    assert p1_u == 60
    # budget binds: huge C * qc shrinks the tail fold below max_tiles
    r2, rt2, _ = _exact_widths(mult, 500, 50000, 512, 512, k, None)
    assert _fold_tiles(rt2, 500, mult) < 500
    # user pass_1 widens the tail fold (up to budget/max_tiles)
    _, rt_narrow, p_a = _exact_widths(mult, max_tiles, 1087, 64, 32,
                                      k, None)
    _, rt_wide, p_b = _exact_widths(mult, max_tiles, 1087, 64, 32,
                                    k, 200)
    assert p_b == 200 and p_a == 40
    assert _fold_tiles(rt_wide, max_tiles, mult) >= _fold_tiles(
        rt_narrow, max_tiles, mult)

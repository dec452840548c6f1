"""Top-k / dedup ops — the heap-replacement contract.

Reference family: tests/test_heap.py (init values, duplicate
suppression, differential test against a Python oracle).
"""

import heapq

import numpy as np

from tinyknn_tpu.ops import (
    dedup_candidates,
    masked_smallest_k,
    merge_topk,
    smallest_k,
    streaming_topk_init,
)

np.random.seed(10)


def test_init_state():
    vals, ids = streaming_topk_init((2,), 5)
    assert np.all(np.isinf(np.asarray(vals)))
    assert np.all(np.asarray(ids) == -1)


def test_smallest_k_sorted():
    x = np.random.randn(3, 50).astype(np.float32)
    vals, idx = smallest_k(x, 7)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for row in range(3):
        np.testing.assert_allclose(vals[row], np.sort(x[row])[:7], rtol=1e-6)
        np.testing.assert_allclose(x[row][idx[row]], vals[row], rtol=1e-6)


def test_masked():
    x = np.arange(10, dtype=np.float32)[None]
    mask = (x % 2 == 0)
    vals, idx = masked_smallest_k(x, mask, 8)
    vals, idx = np.asarray(vals)[0], np.asarray(idx)[0]
    np.testing.assert_allclose(vals[:5], [0, 2, 4, 6, 8])
    assert np.all(np.isinf(vals[5:]))
    assert np.all(idx[5:] == -1)


def test_streaming_merge_vs_heapq():
    """Differential test against a Python heap, like tests/test_heap.py:52-64."""
    k = 8
    vals, ids = streaming_topk_init((1,), k)
    oracle = []
    nxt = 0
    for _ in range(20):
        m = np.random.randint(1, 10)
        new_vals = np.random.randn(1, m).astype(np.float32)
        new_ids = np.arange(nxt, nxt + m, dtype=np.int32)[None]
        nxt += m
        vals, ids = merge_topk(vals, ids, new_vals, new_ids)
        for v, i in zip(new_vals[0], new_ids[0]):
            heapq.heappush(oracle, (float(v), int(i)))
    best = sorted(oracle)[:k]
    np.testing.assert_allclose(np.asarray(vals)[0], [v for v, _ in best],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids)[0], [i for _, i in best])


def test_dedup():
    ids = np.array([[3, 1, 3, 2, 1, 3, -1, 4]], dtype=np.int32)
    vals = np.array([[5.0, 2.0, 1.0, 7.0, 9.0, 6.0, 0.0, 4.0]],
                    dtype=np.float32)
    out_ids, out_vals = dedup_candidates(ids, vals)
    out_ids, out_vals = np.asarray(out_ids)[0], np.asarray(out_vals)[0]
    # Each surviving id keeps its best value, duplicates are -1/inf.
    kept = {int(i): float(v) for i, v in zip(out_ids, out_vals) if i >= 0}
    assert kept == {1: 2.0, 2: 7.0, 3: 1.0, 4: 4.0}
    n_dupes = np.sum(out_ids == -1)
    assert n_dupes == 4  # three dupes killed + the original -1
    assert np.all(np.isinf(out_vals[out_ids == -1]) | (out_ids >= 0).any())


def test_dedup_random():
    for _ in range(5):
        ids = np.random.randint(0, 12, size=(2, 30)).astype(np.int32)
        vals = np.random.randn(2, 30).astype(np.float32)
        out_ids, out_vals = dedup_candidates(ids, vals)
        out_ids, out_vals = np.asarray(out_ids), np.asarray(out_vals)
        for r in range(2):
            valid = out_ids[r] >= 0
            # distinct ids survive
            assert len(set(out_ids[r][valid])) == valid.sum()
            assert set(out_ids[r][valid]) == set(ids[r])
            # each keeps its minimum value
            for i in set(ids[r]):
                expect = vals[r][ids[r] == i].min()
                got = out_vals[r][out_ids[r] == i]
                np.testing.assert_allclose(got, [expect], rtol=1e-6)

"""Scan-kernel-vs-oracle equivalence (reference family 1, tests/test_pq.py:12-53).

The 'kernel' here is the XLA/Pallas one-hot matmul; the oracle is a slow
NumPy loop with plain int32 accumulation. The reference's saturating
int8 semantics (SSE sequential / AVX two-lane) are preserved in a
dedicated emulation op and tested against the reference's own oracle
definitions.
"""

import numpy as np
import pytest
from itertools import product

from tinyknn_tpu.ops import estimate_scan, estimate_scan_saturating
from tinyknn_tpu.ops.scan import estimate_scan_xla

np.random.seed(10)


def numpy_oracle(codes, tables_i8):
    """int32 accumulation oracle: est[q, i] = sum_b t[q, b, codes[i, b]]."""
    Q = tables_i8.shape[0]
    n, B = codes.shape
    out = np.zeros((Q, n), np.int32)
    for q in range(Q):
        for i in range(n):
            out[q, i] = sum(int(tables_i8[q, b, codes[i, b]])
                            for b in range(B))
    return out


def saturating_oracle(codes, tables_u8, signed, lanes):
    """The reference's test oracle (tests/test_pq.py:30-51), vectorized
    over queries."""
    lo, hi = (-128, 127) if signed else (0, 255)
    t = tables_u8.view(np.int8 if signed else np.uint8)
    Q = t.shape[0]
    n, B = codes.shape
    out = np.zeros((Q, n), np.int32)
    for q in range(Q):
        for i in range(n):
            if lanes == 1:
                acc = 0
                for b in range(B):
                    acc = np.clip(acc + int(t[q, b, codes[i, b]]), lo, hi)
            else:
                acc0 = acc1 = 0
                for b in range(B):
                    v = int(t[q, b, codes[i, b]])
                    if b & 2 == 0:
                        acc0 = np.clip(acc0 + v, lo, hi)
                    else:
                        acc1 = np.clip(acc1 + v, lo, hi)
                acc = np.clip(acc0 + acc1, lo, hi)
            out[q, i] = acc
    return out


@pytest.mark.parametrize("n, b, q", product([16, 33], [4, 8], [1, 3]))
def test_estimate_vs_oracle(n, b, q):
    codes = np.random.randint(0, 16, size=(n, b), dtype=np.uint8)
    tables = np.random.randint(-128, 128, size=(q, b, 16)).astype(np.int8)
    est = np.asarray(estimate_scan(codes, tables))
    np.testing.assert_array_equal(est, numpy_oracle(codes, tables))


def test_xla_backend_explicit():
    codes = np.random.randint(0, 16, size=(24, 8), dtype=np.uint8)
    tables = np.random.randint(-128, 128, size=(2, 8, 16)).astype(np.int8)
    est = np.asarray(estimate_scan_xla(codes, tables))
    np.testing.assert_array_equal(est, numpy_oracle(codes, tables))


@pytest.mark.parametrize(
    "n, b, signed, lanes", product([16, 32], [4, 8], [True, False], [1, 2]))
def test_saturating_parity(n, b, signed, lanes):
    """Mirror of the reference SIMD oracle tests (tests/test_pq.py:12-53)."""
    codes = np.random.randint(0, 16, size=(n, b), dtype=np.uint8)
    tables = np.random.randint(0, 256, size=(2, b, 16), dtype=np.uint8)
    est = np.asarray(estimate_scan_saturating(codes, tables, signed, lanes))
    np.testing.assert_array_equal(
        est, saturating_oracle(codes, tables, signed, lanes))

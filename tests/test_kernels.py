"""Pallas kernel vs oracle — interpret mode on CPU (reference family 1).

The jit-vs-interpret equality on real TPU is exercised by bench tooling;
here the kernel's math is pinned against the same NumPy oracle as the
XLA path, including shape-padding edges.
"""

import numpy as np
import pytest
from itertools import product

from tinyknn_tpu.ops.kernels import estimate_scan_pallas
from tinyknn_tpu.ops.scan import estimate_scan_xla

np.random.seed(10)


@pytest.mark.parametrize("n, b, q", product([16, 100, 300], [8, 56], [1, 5]))
def test_pallas_matches_xla(n, b, q):
    codes = np.random.randint(0, 16, size=(n, b), dtype=np.uint8)
    tables = np.random.randint(-128, 128, size=(q, b, 16)).astype(np.int8)
    a = np.asarray(estimate_scan_pallas(codes, tables))
    x = np.asarray(estimate_scan_xla(codes, tables))
    np.testing.assert_array_equal(a, x)


def test_pallas_via_dispatcher():
    from tinyknn_tpu.ops import estimate_scan
    codes = np.random.randint(0, 16, size=(40, 8), dtype=np.uint8)
    tables = np.random.randint(-128, 128, size=(2, 8, 16)).astype(np.int8)
    a = np.asarray(estimate_scan(codes, tables, backend="pallas"))
    x = np.asarray(estimate_scan(codes, tables, backend="xla"))
    np.testing.assert_array_equal(a, x)


@pytest.mark.parametrize("n, b, q", product([16, 100], [8, 56], [1, 5]))
def test_pallas_packed_matches_xla(n, b, q):
    """In-kernel 4-bit unpack (evens/odds order + table block permute)
    must agree with the unpacked XLA oracle."""
    from tinyknn_tpu.ops.packing import pack_codes
    codes = np.random.randint(0, 16, size=(n, b), dtype=np.uint8)
    tables = np.random.randint(-128, 128, size=(q, b, 16)).astype(np.int8)
    a = np.asarray(estimate_scan_pallas(np.asarray(pack_codes(codes)),
                                        tables, packed=True))
    x = np.asarray(estimate_scan_xla(codes, tables))
    np.testing.assert_array_equal(a, x)


def test_scan_select_packed_matches_unpacked():
    """Fused scan+select kernel: packed and unpacked inputs give
    identical candidates (interpret mode)."""
    from tinyknn_tpu.ops.kernels import (
        permute_tables_tiled, scan_select_pallas)
    from tinyknn_tpu.ops.packing import pack_codes
    C, qc, cap, B, r = 3, 8, 32, 8, 5
    codes = np.random.randint(0, 16, size=(C, cap, B), dtype=np.uint8)
    counts = np.random.randint(1, cap + 1, size=(C,)).astype(np.int32)
    tables = np.random.randint(-128, 128, size=(C, qc, B * 16)).astype(np.int8)
    t_plain = np.asarray(permute_tables_tiled(tables, B))
    t_packed = np.asarray(permute_tables_tiled(tables, B, packed=True))
    v1, p1 = scan_select_pallas(t_plain, codes, counts, r, interpret=True)
    v2, p2 = scan_select_pallas(
        t_packed, np.asarray(pack_codes(codes.reshape(-1, B))).reshape(
            C, cap, B // 2),
        counts, r, packed=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

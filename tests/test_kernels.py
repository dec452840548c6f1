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

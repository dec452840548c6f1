#!/usr/bin/env python3
"""SIFT-1M .fvecs(-in-tar) -> .npy converter (reference: examples/sift/convert.py).

Uses the native C++ .fvecs reader when available (tinyknn_tpu.native),
NumPy otherwise.
"""

import sys
import tarfile
import tempfile
from pathlib import Path

import numpy as np

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running without install

from tinyknn_tpu.native import read_fvecs


def convert(src, dst):
    src = Path(src)
    if src.suffix in (".tar", ".gz", ".tgz") or ".tar" in src.name:
        with tarfile.open(src) as tar, tempfile.TemporaryDirectory() as tmp:
            for member in tar.getmembers():
                if member.name.endswith("sift_base.fvecs"):
                    tar.extract(member, tmp, filter="data")
                    mat = read_fvecs(Path(tmp) / member.name)
                    break
            else:
                sys.exit("no sift_base.fvecs found in archive")
    else:
        mat = read_fvecs(src)
    np.save(dst, mat)
    print(f"wrote {dst}: {mat.shape} {mat.dtype}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: convert.py sift.tar.gz|sift_base.fvecs sift.npy")
    convert(sys.argv[1], sys.argv[2])

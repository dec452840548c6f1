#!/usr/bin/env python3
"""GloVe .txt -> .npy converter (reference: examples/glove/convert.py).

Reads 'word v1 v2 ... vd' lines and writes a float32 matrix. Streamed
in chunks so the 27B-token twitter file fits in memory.
"""

import sys

import numpy as np


def convert(txt_path, npy_path, chunk=200_000):
    rows, out = [], []
    with open(txt_path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            rows.append(np.array(parts[1:], dtype=np.float32))
            if len(rows) >= chunk:
                out.append(np.stack(rows))
                rows = []
    if rows:
        out.append(np.stack(rows))
    mat = np.concatenate(out)
    np.save(npy_path, mat)
    print(f"wrote {npy_path}: {mat.shape} {mat.dtype}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: convert.py glove.txt glove.npy")
    convert(sys.argv[1], sys.argv[2])

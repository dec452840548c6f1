"""Synthetic benchmark datasets — ONE source of truth for the recipe.

The no-egress benchmark environment stands in for the reference's real
datasets (GloVe twitter-27B, SIFT-1M; reference examples/glove/convert.py,
examples/sift/convert.py) with a deterministic clustered Gaussian
mixture at the published shapes. The driver benchmark gates recall
against ground-truth archives computed on this data, so EVERY consumer
(bench.py, examples/bench.py, the truth writer, measurement probes)
must draw byte-identical arrays: a drifted copy of the generator would
silently grade an engine against truth for a different dataset — the
exact failure class round 5 spent fixing (docs/PERFORMANCE.md
"Round-5 correction"). tests/test_utils.py pins the recipe.
"""

import numpy as np


def make_clustered(size, dim, n_queries, seed=10):
    """The `clustered-<size>-<dim>` dataset: sqrt(n)-component Gaussian
    mixture (sigma 0.5 around unit-Gaussian centers) — like the real
    embedding datasets, far from iid, so IVF probe-recall dynamics are
    comparable. Returns ``(data, queries)`` float32, split
    ``(size, dim)`` / ``(n_queries, dim)``.

    The rng call ORDER is part of the contract (centers, assignment,
    noise, in that order, one generator): do not reorder.
    """
    rng = np.random.default_rng(seed)
    n_comp = int((size + n_queries) ** 0.5)
    centers = rng.standard_normal((n_comp, dim), dtype=np.float32)
    which = rng.integers(0, n_comp, size + n_queries)
    data = centers[which] + 0.5 * rng.standard_normal(
        (size + n_queries, dim), dtype=np.float32)
    return data[:-n_queries], data[-n_queries:]


def truth_cache_path(size, dim, k, n_queries, metric, cache_dir=""):
    """Canonical ground-truth archive filename for a clustered dataset
    (shared by the sweep harness that writes it, the driver bench that
    gates on it, and the probes that load it)."""
    return (f"{cache_dir}trus_clustered-{size}-{dim}_k_neighbours={k}"
            f"_num_queries={n_queries}_metric='{metric}'.npy")

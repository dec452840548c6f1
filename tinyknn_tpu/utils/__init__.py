from .padding import pad1, pad2, round_up
from .bruteforce import (
    bottom_k,
    bottom_k_2d,
    cdist,
    knn_brute,
    knn_brute1,
    l2_normalize,
    sq_dists,
)
from .grouping import (
    group_data_by_indices,
    invert_assignments,
    invert_assignments_csr,
)
from .timing import block, enable_compilation_cache, profile_trace, timer
from .datasets import make_clustered, truth_cache_path

__all__ = [
    "pad1", "pad2", "round_up",
    "bottom_k", "bottom_k_2d", "cdist", "knn_brute", "knn_brute1",
    "l2_normalize", "sq_dists",
    "group_data_by_indices", "invert_assignments", "invert_assignments_csr",
    "block", "enable_compilation_cache", "profile_trace", "timer",
]

"""alias of kernels/skimp.py (reference algorithms/skimp.py)."""
from ..kernels.skimp import (  # noqa: F401
    binary_split,
    maximum_subsequence,
    skimp,
)

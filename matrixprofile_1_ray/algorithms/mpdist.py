"""alias of kernels/mpdist.py (reference algorithms/mpdist.py)."""
from ..kernels.mpdist import (  # noqa: F401
    calculate_mpdist,
    mass_distance_matrix,
    mpdist,
    mpdist_vector,
)

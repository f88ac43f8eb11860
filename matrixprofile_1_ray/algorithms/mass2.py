"""alias of kernels/mass.py (reference algorithms/mass2.py)."""
from ..kernels.mass import mass2  # noqa: F401

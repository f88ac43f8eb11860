"""alias of kernels/scrimp.py (reference algorithms/scrimp.py)."""
from ..kernels.scrimp import prescrimp, scrimp_plus_plus  # noqa: F401

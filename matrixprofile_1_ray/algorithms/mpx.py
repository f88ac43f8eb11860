"""alias of kernels/mpx.py (reference algorithms/mpx.py)."""
from ..kernels.mpx import mpx, mpx_ab, mpx_self  # noqa: F401

"""alias of kernels/stats.py (reference algorithms/statistics.py)."""
from ..kernels.stats import statistics  # noqa: F401

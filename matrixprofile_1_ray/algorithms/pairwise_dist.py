"""alias of kernels/mpdist.py pairwise helpers (reference
algorithms/pairwise_dist.py)."""
from ..kernels.core_helpers import compute_dist  # noqa: F401
from ..kernels.mpdist import pairwise_dist  # noqa: F401

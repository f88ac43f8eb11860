"""alias of kernels/discover.py discord fns (reference
algorithms/top_k_discords.py)."""
from ..kernels.discover import (  # noqa: F401
    mp_top_k_discords,
    pmp_top_k_discords,
    top_k_discords,
)

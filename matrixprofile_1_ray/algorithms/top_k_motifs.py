"""alias of kernels/discover.py motif fns (reference
algorithms/top_k_motifs.py)."""
from ..kernels.discover import (  # noqa: F401
    mp_top_k_motifs,
    pmp_top_k_motifs,
    top_k_motifs,
)

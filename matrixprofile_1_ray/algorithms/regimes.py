"""alias of kernels/discover.py regime fns (reference algorithms/regimes.py)."""
from ..kernels.discover import (  # noqa: F401
    extract_regimes,
    fluss,
    idealized_arc_curve,
)

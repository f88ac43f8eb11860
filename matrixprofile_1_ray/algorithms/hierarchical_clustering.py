"""alias of kernels/hierarchical.py (reference
algorithms/hierarchical_clustering.py)."""
from ..kernels.hierarchical import hierarchical_clusters  # noqa: F401

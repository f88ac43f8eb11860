"""alias of kernels/discover.py snippets (reference algorithms/snippets.py)."""
from ..kernels.discover import snippets  # noqa: F401

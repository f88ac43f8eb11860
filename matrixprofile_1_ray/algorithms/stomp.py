"""alias of kernels/stomp.py (reference algorithms/stomp.py)."""
from ..kernels.stomp import stomp  # noqa: F401

"""Reference-layout utils namespace (reference utils.py:15-113):
``empty_mp`` and ``pick_mp`` live in kernels/skimp.py here."""

from .kernels.skimp import empty_mp, pick_mp

__all__ = ["empty_mp", "pick_mp"]

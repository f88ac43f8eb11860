"""Reference-layout transform namespace (reference transform.py:14-58):
annotation-vector constructors and ``apply_av``."""

from .kernels.transform import (
    apply_av,
    make_clipping_av,
    make_complexity_av,
    make_default_av,
    make_meanstd_av,
)

__all__ = ["apply_av", "make_default_av", "make_complexity_av",
           "make_meanstd_av", "make_clipping_av"]

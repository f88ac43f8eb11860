"""Reference-layout ``cycore`` namespace (reference cycore.pyx): the
compiled moving-statistics kernels.  Here they are the NumPy
compensated-summation implementations in kernels/moving_stats.py — same
values (MATLAB golden muinvn_mua/stda), no Cython required."""

from .kernels.moving_stats import moving_avg_std, muinvn  # noqa: F401

__all__ = ["moving_avg_std", "muinvn"]

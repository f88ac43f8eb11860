"""Reference-layout ``algorithms.cympx`` module (reference
algorithms/cympx.pyx): the compiled MPX kernels with the reference's
positional ``(..., cross_correlation, n_jobs)`` tail.  Parallelism belongs
to the Ray layer here (state/chunked.py fans diagonals out as tasks), so
``n_jobs`` is accepted and ignored — results are identical at any value,
which is exactly what the reference's own single/multi-thread tests
assert."""

from ..kernels.mpx import mpx_ab, mpx_self


def mpx_parallel(ts, w, cross_correlation=0, n_jobs=1):
    """reference cympx.pyx:30-119 — self-join returning ``(mp, mpi)``."""
    del n_jobs
    return mpx_self(ts, w, cross_correlation=bool(cross_correlation))


def mpx_ab_parallel(ts, query, w, cross_correlation=0, n_jobs=1):
    """reference cympx.pyx:122-282 — AB join returning
    ``(mpa, mpia, mpb, mpib)``."""
    del n_jobs
    return mpx_ab(ts, query, w, cross_correlation=bool(cross_correlation))

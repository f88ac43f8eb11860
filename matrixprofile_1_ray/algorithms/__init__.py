"""Reference-layout ``algorithms`` subpackage: each module aliases the
kernel that implements it here, so reference import paths like
``from matrixprofile.algorithms.mpx import mpx`` keep resolving after a
package rename.  (Reference algorithms/*.py; kernels live in
matrixprofile_1_ray/kernels/.)"""

from . import (  # noqa: F401
    hierarchical_clustering,
    mass2,
    mpdist,
    mpx,
    pairwise_dist,
    regimes,
    scrimp,
    skimp,
    snippets,
    statistics,
    stomp,
    top_k_discords,
    top_k_motifs,
)

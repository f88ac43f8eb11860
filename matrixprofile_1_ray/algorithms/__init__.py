"""Reference-layout ``algorithms`` subpackage: each module aliases the
kernel that implements it here, so reference import paths like
``from matrixprofile.algorithms.mpx import mpx`` keep resolving after a
package rename.  (Reference algorithms/*.py; kernels live in
matrixprofile_1_ray/kernels/.)"""

from . import (  # noqa: F401
    cympx,
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

# The reference's algorithms/__init__.py re-exports these FUNCTIONS, so
# ``algorithms.mpx`` / ``algorithms.skimp`` etc. resolve to the callables
# (shadowing the module attributes above, exactly as in the reference);
# the modules stay importable by full path.
from .mass2 import mass2  # noqa: F401, E402
from .mpdist import mpdist, mpdist_vector  # noqa: F401, E402
from .mpx import mpx  # noqa: F401, E402
from .pairwise_dist import pairwise_dist  # noqa: F401, E402
from .scrimp import prescrimp, scrimp_plus_plus  # noqa: F401, E402
from .skimp import maximum_subsequence, skimp  # noqa: F401, E402
from .stomp import stomp  # noqa: F401, E402

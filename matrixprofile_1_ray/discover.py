"""Reference-layout discovery namespace (reference discover.py:1-8):
``discover.motifs`` / ``discover.discords`` / ``discover.snippets`` /
``discover.regimes`` / ``discover.statistics`` /
``discover.hierarchical_clusters``, aliased onto the kernels."""

from .kernels.discover import snippets
from .kernels.discover import top_k_discords as discords
from .kernels.discover import top_k_motifs as motifs
from .kernels.discover import extract_regimes as regimes
from .kernels.hierarchical import hierarchical_clusters
from .kernels.stats import statistics

__all__ = ["discords", "motifs", "snippets", "regimes", "statistics",
           "hierarchical_clusters"]

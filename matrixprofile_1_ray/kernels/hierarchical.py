"""Hierarchical clustering over MPDist (reference
algorithms/hierarchical_clustering.py:18-146).  The pairwise matrix is the
distributed part (stages/pairs.py); the scipy linkage finish always runs on
the driver — the condensed matrix is tiny relative to the corpus."""

from __future__ import annotations

import numpy as np

from .mpdist import pairwise_dist


def hierarchical_clusters(X, window_size: int, t, threshold: float = 0.05,
                          method: str = "single", depth: int = 2,
                          criterion: str = "distance", n_jobs: int = 1,
                          precomputed_distances=None):
    """Cluster series by MPDist; ``precomputed_distances`` accepts a condensed
    matrix produced by the distributed pairs stage.  ``n_jobs`` accepted for
    reference-signature compatibility, ignored."""
    del n_jobs
    try:  # scipy when available; the target runtime ships without it
        from scipy.cluster.hierarchy import cophenet, fcluster, inconsistent, linkage
    except ImportError:
        from .linkage import cophenet, fcluster, inconsistent, linkage

    valid_methods = {"single", "complete", "average", "weighted"}
    valid_criterions = {"inconsistent", "distance", "monocrit", "maxclust"}
    if (not isinstance(X, (list, tuple, np.ndarray))
            and precomputed_distances is None):
        raise ValueError("X must be array_like!")
    if not isinstance(method, str) or not isinstance(criterion, str):
        raise ValueError("method and criterion must be strings")
    method = method.lower()
    criterion = criterion.lower()
    if not isinstance(t, (float, int)) or isinstance(t, bool):
        raise ValueError("t must be a scalar (int or float)")
    if not isinstance(threshold, float) or not (0 < threshold < 1):
        raise ValueError("threshold must be a float greater than 0 and less than 1")
    if not isinstance(depth, int) or isinstance(depth, bool) or depth < 1:
        raise ValueError("depth must be an integer greater than 0")
    if method not in valid_methods:
        raise ValueError("method may be only one of: " + ", ".join(valid_methods))
    if criterion not in valid_criterions:
        raise ValueError("criterion may be only one of: " + ", ".join(valid_criterions))

    Y = (precomputed_distances if precomputed_distances is not None
         else pairwise_dist(X, window_size, threshold=threshold))
    Z = linkage(Y, method=method)
    R = inconsistent(Z, d=depth)
    c, coph_dists = cophenet(Z, Y)
    T = fcluster(Z, criterion=criterion, depth=depth, R=R, t=t)
    return {
        "pairwise_distances": Y,
        "linkage_matrix": Z,
        "inconsistency_statistics": R,
        "assignments": T,
        "cophenet": c,
        "cophenet_distances": coph_dists,
        "class": "hclusters",
    }

"""Minimal agglomerative-clustering toolkit (pure NumPy).

scipy is not available in the target runtime, so the pieces of
``scipy.cluster.hierarchy`` the reference's hierarchical clustering uses
(linkage / inconsistent / cophenet / fcluster — reference
algorithms/hierarchical_clustering.py:133-136) are reimplemented here from
their published definitions (Lance-Williams updates; SciPy documentation).
Output layouts match scipy's: a (m-1, 4) linkage matrix of
[cluster_i, cluster_j, distance, size] with new clusters numbered m, m+1, ...
"""

from __future__ import annotations

import numpy as np

_LW = {
    # Lance-Williams coefficients a_i, a_j, b, g as functions of sizes
    "single": lambda ni, nj, nk: (0.5, 0.5, 0.0, -0.5),
    "complete": lambda ni, nj, nk: (0.5, 0.5, 0.0, 0.5),
    "average": lambda ni, nj, nk: (ni / (ni + nj), nj / (ni + nj), 0.0, 0.0),
    "weighted": lambda ni, nj, nk: (0.5, 0.5, 0.0, 0.0),
}


def _square(condensed: np.ndarray) -> np.ndarray:
    m = int((1 + np.sqrt(1 + 8 * len(condensed))) / 2)
    D = np.zeros((m, m))
    iu = np.triu_indices(m, 1)
    D[iu] = condensed
    return D + D.T


def linkage(condensed, method: str = "single") -> np.ndarray:
    """Agglomerative linkage over a condensed distance matrix."""
    if method not in _LW:
        raise ValueError(f"unsupported linkage method: {method}")
    coef = _LW[method]
    D = _square(np.asarray(condensed, dtype="d"))
    m = D.shape[0]
    np.fill_diagonal(D, np.inf)

    active = list(range(m))            # positions into D
    labels = list(range(m))            # scipy cluster ids per position
    sizes = {i: 1 for i in range(m)}
    Z = np.empty((m - 1, 4))

    for step in range(m - 1):
        sub = D[np.ix_(active, active)]
        flat = int(np.argmin(sub))
        pi, pj = divmod(flat, len(active))
        if pi > pj:
            pi, pj = pj, pi
        i, j = active[pi], active[pj]
        li, lj = labels[pi], labels[pj]
        dist = D[i, j]
        ni, nj = sizes[li], sizes[lj]
        new_label = m + step
        Z[step] = [min(li, lj), max(li, lj), dist, ni + nj]

        # Lance-Williams update of distances to the merged cluster, stored at i
        for pk, k in enumerate(active):
            if k in (i, j):
                continue
            nk = sizes[labels[pk]]
            ai, aj, b, g = coef(ni, nj, nk)
            new_d = (ai * D[i, k] + aj * D[j, k] + b * dist
                     + g * abs(D[i, k] - D[j, k]))
            D[i, k] = D[k, i] = new_d
        labels[pi] = new_label
        sizes[new_label] = ni + nj
        del active[pj], labels[pj]
    return Z


def _cluster_members(Z, m):
    members = {i: [i] for i in range(m)}
    for step in range(Z.shape[0]):
        members[m + step] = members[int(Z[step, 0])] + members[int(Z[step, 1])]
    return members


def cophenet(Z, condensed):
    """Cophenetic correlation + distances (scipy-compatible tuple)."""
    Z = np.asarray(Z)
    m = Z.shape[0] + 1
    members = _cluster_members(Z, m)
    coph = np.zeros_like(np.asarray(condensed, dtype="d"))

    def cidx(i, j):
        if i > j:
            i, j = j, i
        return m * i + j - ((i + 2) * (i + 1)) // 2

    for step in range(Z.shape[0]):
        left = members[int(Z[step, 0])]
        right = members[int(Z[step, 1])]
        d = Z[step, 2]
        for a in left:
            for b in right:
                coph[cidx(a, b)] = d
    y = np.asarray(condensed, dtype="d")
    denom = np.std(y) * np.std(coph)
    c = 0.0 if denom == 0 else float(np.mean((y - y.mean()) * (coph - coph.mean())) / denom)
    return c, coph


def inconsistent(Z, d: int = 2):
    """Per-link inconsistency statistics [mean, std, count, coefficient]."""
    Z = np.asarray(Z)
    n = Z.shape[0]
    m = n + 1
    R = np.zeros((n, 4))

    def collect(link, depth):
        # heights of links reachable within `depth` levels below (incl. self)
        out = [Z[link, 2]]
        if depth > 1:
            for child in (int(Z[link, 0]), int(Z[link, 1])):
                if child >= m:
                    out.extend(collect(child - m, depth - 1))
        return out

    for link in range(n):
        hs = np.array(collect(link, d))
        mean = hs.mean()
        std = hs.std(ddof=1) if len(hs) > 1 else 0.0
        coef = 0.0 if std == 0 else (Z[link, 2] - mean) / std
        R[link] = [mean, std, len(hs), coef]
    return R


def fcluster(Z, t, criterion: str = "distance", depth: int = 2, R=None,
             monocrit=None):
    """Flat clusters: supported criteria — distance, maxclust,
    inconsistent (cut on R[:, 3], computed at ``depth`` when R is None)
    and monocrit (cut on the caller-provided per-link ``monocrit``
    vector, as in SciPy — NOT on R, which 'monocrit' ignores there)."""
    Z = np.asarray(Z)
    m = Z.shape[0] + 1

    if criterion == "maxclust":
        # find the smallest cut height yielding <= t clusters
        heights = np.concatenate(([0.0], np.sort(Z[:, 2])))
        best = heights[-1]
        for h in heights:
            if _num_clusters(Z, h) <= t:
                best = h
                break
        return _cut(Z, best, m)
    if criterion == "distance":
        return _cut(Z, t, m)
    if criterion == "inconsistent":
        stat = (np.asarray(R)[:, 3] if R is not None
                else inconsistent(Z, depth)[:, 3])
        # merge links whose statistic is <= t
        return _cut_by_mask(Z, stat <= t, m)
    if criterion == "monocrit":
        if monocrit is None:
            # SciPy cuts 'monocrit' on its monocrit= vector and crashes
            # without one (R is ignored); silently falling back to the
            # inconsistency statistic here would cut on the wrong values
            raise ValueError("criterion='monocrit' needs a monocrit= "
                             "per-link statistic vector")
        return _cut_by_mask(Z, np.asarray(monocrit, dtype="d") <= t, m)
    raise ValueError(f"unsupported criterion: {criterion}")


def _num_clusters(Z, h):
    return np.sum(Z[:, 2] > h) + 1


def _cut(Z, h, m):
    # scipy semantics for both maxclust and distance: merge links with
    # cophenetic height <= h
    return _cut_by_mask(Z, Z[:, 2] <= h, m)


def _cut_by_mask(Z, merge_mask, m):
    parent = np.arange(2 * m - 1)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for step in range(Z.shape[0]):
        if merge_mask[step]:
            new = m + step
            for child in (int(Z[step, 0]), int(Z[step, 1])):
                parent[find(child)] = find(new)
    roots = {}
    out = np.empty(m, dtype=int)
    for i in range(m):
        r = find(i)
        out[i] = roots.setdefault(r, len(roots) + 1)
    return out

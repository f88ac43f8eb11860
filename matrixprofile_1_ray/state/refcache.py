"""Bounded per-actor cache over a dict of object-store refs.

The per-pair operators (MPDist pairs, Jaccard verification) keep each
series/shingle-set as its own ``ray.put`` entry and fetch only the two
operands a pair needs; since each doc appears in many pairs, a small
FIFO-evicting cache in the actor turns repeat fetches into local hits."""

from __future__ import annotations


class RefCache:
    def __init__(self, refs: dict, max_items: int = 1024):
        self.refs = refs
        self.max_items = max_items
        self._cache: dict = {}

    def get(self, key):
        value = self._cache.get(key)
        if value is None:
            import ray

            value = ray.get(self.refs[key])
            if len(self._cache) >= self.max_items:
                self._cache.pop(next(iter(self._cache)))
            self._cache[key] = value
        return value

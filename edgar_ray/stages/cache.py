"""Per-worker-process instance cache for cheap-init batch callables.

Plain ``map_batches(fn)`` tasks reuse the cached instance across batches in
the same worker process without paying actor-pool spin-up per query. Reserve
``map_batches(Cls, concurrency=...)`` actor pools for genuinely heavy init
(model loads, large index builds) — a compiled regex or a 64-entry hash
table is not that.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_instance(cls, **kwargs):
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))
    if key not in _CACHE:
        _CACHE[key] = cls(**kwargs)
    return _CACHE[key]

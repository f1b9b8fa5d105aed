"""Worker-global broadcast cache.

The broadcast pattern (``ray.put`` once on the driver, read in every task)
has two implementations: an actor pool (``__init__`` fetches once per actor
— right when there is real setup work like regex compilation or model
load), or plain task functions with this cache — right for cheap lookups,
because task pools reuse existing worker processes instead of paying actor
startup per stage.

``get_broadcast(ref)`` fetches the object once per worker process and
memoizes it; ``ray.get`` on a shared-memory object is cheap but the
deserialize (e.g. pandas) is not, hence the cache. The cache is a small
LRU: long-lived workers serve many pipeline runs, and an unbounded cache
would pin every broadcast object a worker ever saw (dictionaries, lookup
maps) in the worker heap forever.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

_CACHE: OrderedDict[str, Any] = OrderedDict()
_MAX_ENTRIES = 16


def get_broadcast(ref: Any) -> Any:
    import ray

    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = ray.get(ref)
    _CACHE[key] = val
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return val


def get_broadcast_transformed(ref: Any, key_suffix: str, transform) -> Any:
    """Broadcast fetch + worker-cached derived view (e.g. the pandas frame
    or a hash index built from a broadcast Arrow table) — the transform runs
    once per worker, not once per batch."""
    import ray

    if not isinstance(ref, ray.ObjectRef):
        return transform(ref)
    key = ref.hex() + ":" + key_suffix
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = transform(get_broadcast(ref))
    _CACHE[key] = val
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return val

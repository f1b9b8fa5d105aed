"""Worker-global broadcast cache.

The broadcast pattern (``ray.put`` once on the driver, read in every task)
has two implementations: an actor pool (``__init__`` fetches once per actor
— right when there is real setup work like regex compilation or model
load), or plain task functions with this cache — right for cheap lookups,
because task pools reuse existing worker processes instead of paying actor
startup per stage.

``get_broadcast(ref)`` fetches the object once per worker process and
memoizes it; ``ray.get`` on a shared-memory object is cheap but the
deserialize (e.g. pandas) is not, hence the cache.
"""

from __future__ import annotations

from typing import Any

_CACHE: dict[str, Any] = {}


def get_broadcast(ref: Any) -> Any:
    import ray

    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]

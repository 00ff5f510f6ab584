"""Broadcast small lookup tables through the Ray object store.

Pattern: ``ray.put`` ONCE on the driver, pass the ObjectRef through
``fn_constructor_kwargs``; each actor calls :func:`resolve` in ``__init__``
so the object is fetched once per actor (shared memory per node), never
re-shipped per batch.  This replaces shuffle joins for small sides
(SURVEY.md §2.5 J2).
"""

from __future__ import annotations

from typing import Any


def broadcast(obj: Any):
    import ray
    return ray.put(obj)


def resolve(maybe_ref: Any) -> Any:
    import ray
    if isinstance(maybe_ref, ray.ObjectRef):
        return ray.get(maybe_ref)
    return maybe_ref

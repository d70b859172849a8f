"""Broadcast helpers for worker-pinned state (the KB).

The KB is put into the object store ONCE on the driver (``ray.put``) and
each actor deserializes it ONCE in ``__init__`` — never per batch
(SURVEY.md §2.3; the analogue of DataAccessCache preloading per JVM).
"""

from __future__ import annotations

import ray


def put_kb(kb) -> "ray.ObjectRef":
    return ray.put(kb)


def resolve(ref_or_obj):
    """Accept either an ObjectRef (production) or the object itself (tests)."""
    if isinstance(ref_or_obj, ray.ObjectRef):
        return ray.get(ref_or_obj)
    return ref_or_obj

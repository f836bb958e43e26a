"""Bounded host fetches that cannot strand a worker pool.

The reference's 20 s data watchdog (src/utils/data.cpp:42-49) aborts a
wait, not the underlying work.  A fixed ThreadPoolExecutor reproduces
that badly: a timed-out ``np.asarray`` keeps its worker blocked forever,
and after ``max_workers`` hangs every *healthy* fetch queues behind dead
threads and times out too — one transient stall cascades into permanent
failure.  Instead each fetch gets a fresh daemon thread; a hung fetch
leaks exactly one thread (logged), and the next fetch starts unimpeded.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Callable

log = logging.getLogger("cartslam.watchdog")

_stranded = 0
_stranded_lock = threading.Lock()


def stranded_count() -> int:
    """Number of fetch threads abandoned by a timeout (still blocked)."""
    return _stranded


def run_with_timeout(fn: Callable[[], Any], timeout: float) -> Any:
    """Run ``fn`` on a fresh daemon thread; raise TimeoutError if it
    does not finish within ``timeout`` seconds.

    The thread is not (cannot be) cancelled — it is abandoned and
    counted, so observability surfaces accumulating stranded workers
    while healthy fetches stay unaffected.
    """
    out: queue.Queue = queue.Queue(maxsize=1)

    def worker():
        global _stranded
        try:
            out.put((True, fn()))
        except BaseException as e:  # delivered to the waiter
            out.put((False, e))
        finally:
            with _stranded_lock:
                if done.is_set():
                    _stranded -= 1

    done = threading.Event()
    t = threading.Thread(target=worker, daemon=True, name="cart-fetch")
    t.start()
    try:
        ok, val = out.get(timeout=timeout)
    except queue.Empty:
        with _stranded_lock:
            global _stranded
            _stranded += 1
            done.set()
            n = _stranded
        log.warning(
            "fetch exceeded %.1fs; abandoning its thread (%d stranded)",
            timeout, n,
        )
        raise TimeoutError(f"fetch exceeded {timeout}s") from None
    if ok:
        return val
    raise val

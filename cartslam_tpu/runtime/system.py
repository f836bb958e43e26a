"""System driver: the host loop around the jitted pipeline step.

Replaces the reference's System scheduler (src/cartslam.cpp:179-334): the
192-thread pool + promise store become XLA async dispatch; the 12-frame
concurrent-run backpressure (include/cartslam.hpp:4) becomes a bounded
in-flight queue of dispatched steps; run retention becomes the host-visible
result deque.

Failure semantics follow the reference:
  * one bad frame logs and continues (src/main.cpp:48-54).  Because frames
    share carried device state, a frame whose async execution fails poisons
    the dispatched chain; recovery restores the last known-good state
    snapshot and resumes (the carried-state equivalent of dropping a frame).
  * a result fetch that hangs raises DataNotAvailableException after
    ``data_timeout`` seconds, the 20 s watchdog of src/utils/data.cpp:42-49.
"""

from __future__ import annotations

import collections
import logging
import queue
import threading
import traceback
from typing import Any, Callable, Iterable, Mapping

import jax
import numpy as np

from .module import HostModule
from .pipeline import Pipeline
from .timing import TimingWriter
from ..utils.watchdog import start_fetch

log = logging.getLogger("cart.system")


class DataNotAvailableException(RuntimeError):
    """A frame's results did not materialize within the data timeout.

    Contract parity with the reference's DataNotAvailableException
    (include/utils/data.hpp:11, thrown at src/utils/data.cpp:42-49).
    """


class System:
    """Drives frames from a DataSource through a Pipeline.

    Args:
        source: DataSource (sources.base.DataSource).
        pipeline: composed Pipeline.
        host_modules: visualization/recording consumers.
        max_in_flight: dispatched-but-unfetched step results
            (reference pipeline depth: 12 concurrent runs).
        prefetch_depth: host frame decode look-ahead.
        module_timing: run module-by-module with a device sync per module,
            emitting a per-module CSV timing row (reference:
            src/cartslam.cpp:259-291).  Disables cross-module fusion.
        data_timeout: seconds before a hung result fetch raises
            DataNotAvailableException (reference: 20 s).
        snapshot_interval: frames between host snapshots of the device state
            used for failed-frame recovery; 0 disables recovery snapshots.
    """

    def __init__(
        self,
        source,
        pipeline: Pipeline,
        host_modules: Iterable[HostModule] = (),
        *,
        max_in_flight: int = 4,
        prefetch_depth: int = 12,
        timing: TimingWriter | None = None,
        image_sink=None,
        max_frames: int | None = None,
        extra_fetch_keys: Iterable[str] = (),
        checkpoint_path: str | None = None,
        checkpoint_interval: int = 100,
        resume_from: str | None = None,
        module_timing: bool = False,
        data_timeout: float = 20.0,
        snapshot_interval: int = 64,
        run_retention: int = 32,
    ):
        self.source = source
        self.pipeline = pipeline
        self.host_modules = list(host_modules)
        self.max_in_flight = max_in_flight
        self.prefetch_depth = prefetch_depth
        self.timing = timing or TimingWriter(enabled=False)
        self.image_sink = image_sink
        self.max_frames = max_frames
        self.checkpoint_path = checkpoint_path
        self.checkpoint_interval = checkpoint_interval
        self.resume_from = resume_from
        self.module_timing = module_timing
        self.data_timeout = data_timeout
        self.snapshot_interval = snapshot_interval
        self.global_data: dict[str, Any] = {}
        self.failed_frames: list[int] = []
        # Reference: ring of the last CARTSLAM_RUN_RETENTION=32 runs,
        # reachable by id (include/cartslam.hpp:3, System::getRunById).
        self.run_retention = run_retention
        self._retained: collections.OrderedDict[int, dict] = (
            collections.OrderedDict()
        )

        self._fetch_keys = frozenset(
            set(pipeline.host_fetch_keys())
            | {d.key for hm in self.host_modules for d in hm.requires()}
            | set(extra_fetch_keys)
        )

        self._prefetch_queue: queue.Queue = queue.Queue(maxsize=prefetch_depth)
        self._prefetch_error: BaseException | None = None

    # ------------------------------------------------------------ global data

    def insert_global_data(self, key: str, value: Any):
        """reference: System::insertGlobalData (include/cartslam.hpp:84)."""
        self.global_data[key] = value

    def get_global_data(self, key: str) -> Any:
        return self.global_data[key]

    def get_run_by_id(self, frame_id: int) -> Mapping[str, np.ndarray]:
        """Fetched outputs of a retained run (System::getRunById parity).

        Raises KeyError for ids outside the retention window, like the
        reference throws for too-old/too-new ids (src/cartslam.cpp:210-222).
        """
        return self._retained[frame_id]

    def _retain(self, frame_id: int, fetched) -> None:
        if not self.run_retention:
            return
        self._retained[frame_id] = fetched
        while len(self._retained) > self.run_retention:
            self._retained.popitem(last=False)

    # -------------------------------------------------------------- prefetch

    def _prefetch_worker(self):
        try:
            while not self.source.is_finished():
                frame = self.source.get_next()
                if frame is None:
                    break
                if self.pipeline.ctx.grayscale:
                    # Whole-pipeline grayscale switch — the runtime-flag
                    # form of CARTSLAM_IMAGE_MAKE_GRAYSCALE
                    # (src/datasource.cpp:6-16): images are converted at
                    # the source boundary, every module sees 1 channel.
                    frame = dict(frame)
                    for k in ("left", "right"):
                        img = frame[k]
                        if img.ndim == 3:
                            y = (
                                0.114 * img[..., 0].astype(np.float32)
                                + 0.587 * img[..., 1]
                                + 0.299 * img[..., 2]
                            )
                            frame[k] = np.clip(np.round(y), 0, 255).astype(
                                np.uint8
                            )
                self._prefetch_queue.put(frame)
        except BaseException as e:  # surfaced in run()
            self._prefetch_error = e
        finally:
            self._prefetch_queue.put(None)

    # --------------------------------------------------------------- fetching

    def _fetch_with_timeout(self, outputs) -> dict[str, np.ndarray]:
        """Materialize device outputs on host (runs on the fetch thread).

        The data-watchdog bound is applied when the result is JOINED
        (_join_fetch), not here — fault-injection tests patch this method
        to simulate hung or failing transfers."""
        return {k: np.asarray(v) for k, v in outputs.items()}

    def _start_fetch(self, outputs):
        """Begin materializing device outputs on host (eager drain).

        The fetch starts on its own daemon thread at DISPATCH time, so the
        device->host transfer latency of frame N overlaps the dispatch of
        frames N+1..N+k instead of serializing the loop — the same reason
        the reference fetches through its promise store's worker threads
        (src/utils/data.cpp).  A hung transfer is abandoned at join time
        (utils/watchdog.py), never stranding a shared pool worker."""
        return start_fetch(lambda: self._fetch_with_timeout(outputs))

    def _join_fetch(self, fetch_handle) -> dict[str, np.ndarray]:
        """Join an eager fetch, bounded by the data watchdog (20 s)."""
        try:
            return fetch_handle.result(self.data_timeout)
        except TimeoutError:
            raise DataNotAvailableException(
                f"frame results not available within {self.data_timeout}s"
            ) from None

    # ------------------------------------------------------------------- run

    def run(self, on_frame: Callable[[int, Mapping[str, np.ndarray]], None] | None = None):
        """Process the whole sequence; returns number of frames processed."""
        start_frame = 0
        if self.resume_from is not None:
            from .checkpoint import load_checkpoint

            raw, start_frame, host_state = load_checkpoint(
                self.resume_from, self.pipeline.init_state()
            )
            state = jax.device_put(raw)
            for m in self.pipeline.modules:
                if m.name in host_state:
                    m.restore_host_state(host_state[m.name])
            if hasattr(self.source, "skip"):
                self.source.skip(start_frame)
            log.info("resumed from %s at frame %d", self.resume_from, start_frame)
        else:
            state = jax.device_put(self.pipeline.init_state())
        host_params = self.pipeline.init_host_params()

        thread = threading.Thread(target=self._prefetch_worker, daemon=True)
        thread.start()

        in_flight: collections.deque = collections.deque()
        frame_id = start_frame
        processed = 0
        # Recovery snapshot: last known-good host copy of the device state.
        snap_state = jax.device_get(state) if self.snapshot_interval else None
        need_recovery = False

        sys_handle = self.timing.init_timing("system", 0).begin()

        def drain_one() -> bool:
            """Fetch + host-process the oldest in-flight frame.

            Returns False when the frame failed (async device error or
            watchdog timeout) — the dispatched chain is then poisoned and the
            caller must recover state.
            """
            nonlocal processed
            fid, handle, frame_np, fetch_handle = in_flight.popleft()
            try:
                fetched = self._join_fetch(fetch_handle)
            except Exception:
                log.error(
                    "frame %d failed (async):\n%s", fid, traceback.format_exc()
                )
                self.failed_frames.append(fid)
                return False
            # End the frame's timing row at the fetch's actual completion
            # time, not the (possibly later) join.
            handle.end = fetch_handle.t_end_ms
            self.timing.end_timing_at(handle)
            self._retain(fid, fetched)
            try:
                self._host_post_frame(fid, frame_np, fetched, host_params)
            except Exception:
                log.error("frame %d host processing failed:\n%s", fid, traceback.format_exc())
            if on_frame is not None:
                on_frame(fid, fetched)
            processed += 1
            return True

        def drain_all():
            nonlocal need_recovery
            while in_flight:
                if not drain_one():
                    need_recovery = True

        while True:
            if need_recovery:
                # The dispatched chain consumed a poisoned state. Drop
                # whatever is still queued on device and restart from the
                # last good snapshot (src/main.cpp:48-54 semantics, adapted
                # to carried state).
                drain_all()
                need_recovery = False
                if snap_state is not None:
                    state = jax.device_put(snap_state)
                    log.warning("recovered pipeline state from snapshot")
                else:
                    state = jax.device_put(self.pipeline.init_state())
                    log.warning("no snapshot available; state re-initialized")

            frame_np = self._prefetch_queue.get()
            if frame_np is None:
                break
            frame_id += 1
            if self.max_frames is not None and frame_id > self.max_frames:
                break

            handle = self.timing.init_timing("frame", frame_id)
            variant = self.pipeline.variant(frame_id)

            frame_dev = dict(frame_np)
            frame_dev["frame_id"] = np.int32(frame_id)

            handle.mark_start()
            try:
                if self.module_timing:
                    state, outputs, mod_times = self.pipeline.run_step_instrumented(
                        state, frame_dev, host_params, variant, self._fetch_keys
                    )
                    self._emit_module_rows(frame_id, mod_times)
                else:
                    step = self.pipeline.jitted_step(variant, self._fetch_keys)
                    state, outputs = step(state, frame_dev, host_params)
            except Exception:
                log.error("frame %d failed:\n%s", frame_id, traceback.format_exc())
                self.failed_frames.append(frame_id)
                need_recovery = True
                continue

            in_flight.append(
                (frame_id, handle, frame_np, self._start_fetch(outputs))
            )
            while len(in_flight) >= self.max_in_flight:
                if not drain_one():
                    need_recovery = True
                    break

            if (
                not need_recovery
                and self.snapshot_interval
                and frame_id % self.snapshot_interval == 0
            ):
                drain_all()  # ensure the snapshot state is actually good
                if not need_recovery:
                    snap_state = jax.device_get(state)

            if (
                not need_recovery
                and self.checkpoint_path is not None
                and frame_id % self.checkpoint_interval == 0
            ):
                from .checkpoint import save_checkpoint

                # Drain so module host_state (running histograms, provider
                # ranges) is synchronized with the saved device state —
                # otherwise a resumed run silently loses the in-flight
                # frames' histogram contributions.
                drain_all()
                if not need_recovery:
                    save_checkpoint(
                        self.checkpoint_path,
                        state,
                        frame_id,
                        {m.name: m.host_state() for m in self.pipeline.modules},
                    )

        drain_all()

        self.timing.end_timing(sys_handle)
        if self._prefetch_error is not None:
            raise self._prefetch_error
        self.final_state = jax.device_get(state)
        return processed

    # --------------------------------------------------------- host callbacks

    def _emit_module_rows(self, frame_id: int, mod_times):
        """Write per-module CSV rows (name;run_id;init;start;end;duration)."""
        import time as _time

        # Map perf_counter seconds onto the epoch-ms clock the CSV uses.
        base = _time.time() * 1000 - _time.perf_counter() * 1000
        for name, t_init, t_start, t_end in mod_times:
            h = self.timing.init_timing(name, frame_id)
            h.init = round(base + t_init * 1000, 3)
            h.start = round(base + t_start * 1000, 3)
            h.end = round(base + t_end * 1000, 3)
            self.timing.end_timing_at(h)

    def _host_post_frame(self, frame_id, frame_np, fetched, host_params):
        for m in self.pipeline.modules:
            sub = {k: fetched[k] for k in m.host_fetch_keys() if k in fetched}
            updated = m.host_update(self.pipeline.ctx, frame_id, sub, system=self)
            if updated:
                host_params[m.name] = {**host_params.get(m.name, {}), **updated}

        # Host-computed per-run data (planes_eq etc.): merged into the
        # frame's fetched dict — the SAME object held in the retention
        # ring, so get_run_by_id and later host modules observe the keys
        # (reference data contract, include/modules/planefit.hpp:9-16).
        for hm in self.host_modules:
            if not hm.provides_data():
                continue
            try:
                extra = hm.process(
                    self.pipeline.ctx, frame_id, frame_np, fetched,
                    self.global_data,
                )
            except Exception:
                log.error(
                    "host module %s process failed:\n%s",
                    hm.name, traceback.format_exc(),
                )
                continue
            if extra:
                fetched.update(extra)

        for hm in self.host_modules:
            try:
                img = hm.render(self.pipeline.ctx, frame_id, frame_np, fetched, self.global_data)
            except Exception:
                log.error("host module %s failed:\n%s", hm.name, traceback.format_exc())
                continue
            if img is None or self.image_sink is None:
                continue
            if isinstance(img, dict):
                for win, im in img.items():
                    self.image_sink.set_image_if_later(win, im, frame_id)
            else:
                self.image_sink.set_image_if_later(hm.name, img, frame_id)

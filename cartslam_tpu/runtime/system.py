"""System driver: the host loop around the jitted pipeline step.

Replaces the reference's System scheduler (src/cartslam.cpp:179-334): the
192-thread pool + promise store become XLA async dispatch; the 12-frame
concurrent-run backpressure (include/cartslam.hpp:4) becomes a bounded
in-flight queue of dispatched steps; run retention becomes the host-visible
result deque.  One bad frame logs and continues, like main.cpp:48-54.
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

from .module import HostModule, PipelineContext
from .pipeline import Pipeline
from .timing import TimingWriter

log = logging.getLogger("cart.system")


class System:
    """Drives frames from a DataSource through a Pipeline.

    Args:
        source: DataSource (sources.base.DataSource).
        pipeline: composed Pipeline.
        host_modules: visualization/recording consumers.
        max_in_flight: dispatched-but-unfetched step results
            (reference pipeline depth: 12 concurrent runs).
        prefetch_depth: host frame decode look-ahead.
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
        self.global_data: dict[str, Any] = {}

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

    # -------------------------------------------------------------- prefetch

    def _prefetch_worker(self):
        try:
            while not self.source.is_finished():
                frame = self.source.get_next()
                if frame is None:
                    break
                self._prefetch_queue.put(frame)
        except BaseException as e:  # surfaced in run()
            self._prefetch_error = e
        finally:
            self._prefetch_queue.put(None)

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

        sys_handle = self.timing.init_timing("system", 0).begin()

        def drain_one():
            nonlocal processed
            fid, handle, frame_np, outputs = in_flight.popleft()
            fetched = {k: np.asarray(v) for k, v in outputs.items()}
            self.timing.end_timing(handle)
            try:
                self._host_post_frame(fid, frame_np, fetched, host_params)
            except Exception:
                log.error("frame %d host processing failed:\n%s", fid, traceback.format_exc())
            if on_frame is not None:
                on_frame(fid, fetched)
            processed += 1

        while True:
            frame_np = self._prefetch_queue.get()
            if frame_np is None:
                break
            frame_id += 1
            if self.max_frames is not None and frame_id > self.max_frames:
                break

            handle = self.timing.init_timing("frame", frame_id)
            variant = self.pipeline.variant(frame_id)
            step = self.pipeline.jitted_step(variant, self._fetch_keys)

            frame_dev = dict(frame_np)
            frame_dev["frame_id"] = np.int32(frame_id)

            handle.mark_start()
            try:
                state, outputs = step(state, frame_dev, host_params)
            except Exception:
                log.error("frame %d failed:\n%s", frame_id, traceback.format_exc())
                continue

            in_flight.append((frame_id, handle, frame_np, outputs))
            while len(in_flight) >= self.max_in_flight:
                drain_one()

            if (
                self.checkpoint_path is not None
                and frame_id % self.checkpoint_interval == 0
            ):
                from .checkpoint import save_checkpoint

                save_checkpoint(
                    self.checkpoint_path,
                    state,
                    frame_id,
                    {m.name: m.host_state() for m in self.pipeline.modules},
                )

        while in_flight:
            drain_one()

        self.timing.end_timing(sys_handle)
        if self._prefetch_error is not None:
            raise self._prefetch_error
        self.final_state = jax.device_get(state)
        return processed

    # --------------------------------------------------------- host callbacks

    def _host_post_frame(self, frame_id, frame_np, fetched, host_params):
        for m in self.pipeline.modules:
            sub = {k: fetched[k] for k in m.host_fetch_keys() if k in fetched}
            updated = m.host_update(self.pipeline.ctx, frame_id, sub, system=self)
            if updated:
                host_params[m.name] = {**host_params.get(m.name, {}), **updated}

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

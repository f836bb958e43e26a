"""MultiSeqSystem: lock-step data-parallel driver over a device mesh.

The user-launchable multi-chip throughput mode (config:
``{"parallel": {"mode": "multiseq", "batch": N}}``): B independent video
sequences advance in lock-step; the pipeline step is vmapped over the
batch and the batch axis is sharded across a 1-D ``data`` mesh, so
throughput scales with chips over ICI and each sequence's carried state
stays chip-local (zero hot-path collectives — SURVEY §2.7's honest
data-parallel axis for a perception pipeline).

Host-side plane-parameter estimation aggregates the per-sequence
histograms (summing before the provider update) — the scale-out analogue
of the reference's single shared provider (planeseg.cu:269-288).
"""

from __future__ import annotations

import functools
import logging
import traceback
from typing import Any, Callable, Iterable, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime.module import HostModule
from ..runtime.pipeline import Pipeline
from ..runtime.timing import TimingWriter

log = logging.getLogger("cart.multiseq")


class MultiSeqSystem:
    """Drives B sources through one vmapped pipeline across a device mesh.

    Args:
        sources: exactly B DataSources (sequences advance in lock-step; the
            run ends when any source is exhausted).
        pipeline: the shared Pipeline.
        devices: devices for the 1-D mesh (default: all local devices).
            B must be divisible by the device count.
    """

    def __init__(
        self,
        sources,
        pipeline: Pipeline,
        host_modules: Iterable[HostModule] = (),
        *,
        devices=None,
        timing: TimingWriter | None = None,
        image_sink=None,
        max_frames: int | None = None,
        max_in_flight: int = 4,
        extra_fetch_keys: Iterable[str] = (),
        checkpoint_path: str | None = None,
        checkpoint_interval: int = 100,
        resume_from: str | None = None,
    ):
        self.sources = list(sources)
        self.batch = len(self.sources)
        self.pipeline = pipeline
        self.host_modules = list(host_modules)
        self.timing = timing or TimingWriter(enabled=False)
        self.image_sink = image_sink
        self.max_frames = max_frames
        self.max_in_flight = max_in_flight
        self.checkpoint_path = checkpoint_path
        self.checkpoint_interval = checkpoint_interval
        self.resume_from = resume_from
        self.global_data: dict[str, Any] = {}

        devs = list(devices) if devices is not None else jax.devices()
        while self.batch % len(devs) != 0:
            devs = devs[:-1]  # drop to a divisor of the batch
        self.mesh = Mesh(np.array(devs), ("data",))
        self._shard = NamedSharding(self.mesh, P("data"))
        self._repl = NamedSharding(self.mesh, P())

        self._fetch_keys = frozenset(
            set(pipeline.host_fetch_keys())
            | {d.key for hm in self.host_modules for d in hm.requires()}
            | set(extra_fetch_keys)
        )

    def insert_global_data(self, key: str, value: Any):
        self.global_data[key] = value

    def get_global_data(self, key: str) -> Any:
        return self.global_data[key]

    @functools.lru_cache(maxsize=64)
    def _jitted(self, variant: tuple, fetch_keys: frozenset):
        step = self.pipeline.make_step(variant, fetch_keys)
        vstep = jax.vmap(step, in_axes=(0, 0, None))
        return jax.jit(
            vstep,
            donate_argnums=(0,),
            in_shardings=(self._shard, self._shard, self._repl),
            out_shardings=(self._shard, self._shard),
        )

    def _stack_frames(self):
        frames = []
        for s in self.sources:
            if s.is_finished():
                return None
            f = s.get_next()
            if f is None:
                return None
            frames.append(f)
        keys = frames[0].keys()
        return {k: np.stack([f[k] for f in frames], axis=0) for k in keys}

    def run(self, on_frame: Callable[[int, Mapping[str, np.ndarray]], None] | None = None):
        """Process until any source is exhausted; returns frames processed
        (lock-step rounds x batch)."""
        one = self.pipeline.init_state()
        init_batched = jax.tree.map(lambda x: np.stack([x] * self.batch, axis=0), one)
        start_frame = 0
        if self.resume_from is not None:
            from ..runtime.checkpoint import load_checkpoint

            raw, start_frame, host_state = load_checkpoint(
                self.resume_from, init_batched
            )
            state = jax.device_put(raw, self._shard)
            for m in self.pipeline.modules:
                if m.name in host_state:
                    m.restore_host_state(host_state[m.name])
            for s in self.sources:
                if hasattr(s, "skip"):
                    s.skip(start_frame)
            log.info("resumed from %s at round %d", self.resume_from, start_frame)
        else:
            state = jax.device_put(init_batched, self._shard)
        host_params = self.pipeline.init_host_params()

        in_flight = []
        frame_id = start_frame
        processed = 0
        sys_handle = self.timing.init_timing("system", 0).begin()

        def drain_one():
            nonlocal processed
            fid, handle, outputs = in_flight.pop(0)
            fetched = {k: np.asarray(v) for k, v in outputs.items()}
            self.timing.end_timing(handle)
            try:
                self._host_post_frame(fid, fetched, host_params)
            except Exception:
                log.error("round %d host processing failed:\n%s", fid, traceback.format_exc())
            if on_frame is not None:
                on_frame(fid, fetched)
            processed += self.batch

        while True:
            frame_np = self._stack_frames()
            if frame_np is None:
                break
            frame_id += 1
            if self.max_frames is not None and frame_id > self.max_frames:
                break
            handle = self.timing.init_timing("frame", frame_id)
            variant = self.pipeline.variant(frame_id)
            step = self._jitted(variant, self._fetch_keys)

            frame_np["frame_id"] = np.full((self.batch,), frame_id, np.int32)
            frame_dev = jax.device_put(frame_np, self._shard)

            handle.mark_start()
            try:
                with self.mesh:
                    state, outputs = step(state, frame_dev, host_params)
            except Exception:
                log.error("round %d failed:\n%s", frame_id, traceback.format_exc())
                break
            in_flight.append((frame_id, handle, outputs))
            while len(in_flight) >= self.max_in_flight:
                drain_one()

            if (
                self.checkpoint_path is not None
                and frame_id % self.checkpoint_interval == 0
            ):
                from ..runtime.checkpoint import save_checkpoint

                while in_flight:  # sync host state with the saved device state
                    drain_one()
                save_checkpoint(
                    self.checkpoint_path,
                    state,
                    frame_id,
                    {m.name: m.host_state() for m in self.pipeline.modules},
                )

        while in_flight:
            drain_one()
        self.timing.end_timing(sys_handle)
        self.final_state = jax.device_get(state)
        return processed

    def _host_post_frame(self, frame_id, fetched, host_params):
        # Aggregate per-sequence histograms (sum over the batch axis) so the
        # shared parameter provider sees fleet-wide statistics.
        for m in self.pipeline.modules:
            sub = {}
            for k in m.host_fetch_keys():
                if k in fetched:
                    v = fetched[k]
                    sub[k] = v.sum(axis=0) if v.ndim >= 1 else v
            updated = m.host_update(self.pipeline.ctx, frame_id, sub, system=self)
            if updated:
                host_params[m.name] = {**host_params.get(m.name, {}), **updated}

        # Visualization renders sequence 0.
        for hm in self.host_modules:
            try:
                sub = {k: v[0] for k, v in fetched.items()}
                img = hm.render(self.pipeline.ctx, frame_id, {}, sub, self.global_data)
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

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
of the reference's single shared provider (planeseg.cu:269-288).  Which
keys are additive is declared per module (``Module.host_fetch_reduce``);
undeclared keys fall back to sequence 0 with a one-time warning instead
of being silently batch-summed.

Fault tolerance matches the single-sequence System (src/main.cpp:48-54
semantics, adapted to carried state): result fetches run under the 20 s
data watchdog, a failed round logs-and-continues after restoring the
last known-good state snapshot, and failed round ids are recorded in
``failed_frames``.
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
from ..utils.watchdog import run_with_timeout
from ..runtime.pipeline import Pipeline
from ..runtime.system import DataNotAvailableException
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
        data_timeout: seconds before a hung result fetch raises
            DataNotAvailableException (reference: 20 s).
        snapshot_interval: rounds between host snapshots of the batched
            device state used for failed-round recovery; 0 disables.
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
        data_timeout: float = 20.0,
        snapshot_interval: int = 64,
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
        self.data_timeout = data_timeout
        self.snapshot_interval = snapshot_interval
        self.global_data: dict[str, Any] = {}
        self.failed_frames: list[int] = []
        self._warned_keys: set[str] = set()

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
        if self.pipeline.ctx.grayscale:
            # Whole-pipeline grayscale switch, same conversion as
            # System._prefetch_worker — without this, ctx.grayscale modules
            # would trace against 1-channel shapes while frames stay BGR.
            converted = []
            for f in frames:
                f = dict(f)
                for k in ("left", "right"):
                    img = f[k]
                    if img.ndim == 3:
                        y = (
                            0.114 * img[..., 0].astype(np.float32)
                            + 0.587 * img[..., 1]
                            + 0.299 * img[..., 2]
                        )
                        f[k] = np.clip(np.round(y), 0, 255).astype(np.uint8)
                converted.append(f)
            frames = converted
        keys = frames[0].keys()
        return {k: np.stack([f[k] for f in frames], axis=0) for k in keys}

    def _fetch_with_timeout(self, outputs) -> dict[str, np.ndarray]:
        # Fresh daemon thread per fetch (utils/watchdog.py): a hung
        # transfer cannot strand a shared pool worker.
        try:
            return run_with_timeout(
                lambda: {k: np.asarray(v) for k, v in outputs.items()},
                self.data_timeout,
            )
        except TimeoutError:
            raise DataNotAvailableException(
                f"round results not available within {self.data_timeout}s"
            ) from None

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
        snap_state = (
            jax.device_get(state) if self.snapshot_interval else None
        )
        need_recovery = False
        sys_handle = self.timing.init_timing("system", 0).begin()

        def drain_one() -> bool:
            nonlocal processed
            fid, handle, outputs = in_flight.pop(0)
            try:
                fetched = self._fetch_with_timeout(outputs)
            except Exception:
                log.error(
                    "round %d failed (async):\n%s", fid, traceback.format_exc()
                )
                self.failed_frames.append(fid)
                return False
            self.timing.end_timing(handle)
            try:
                self._host_post_frame(fid, fetched, host_params)
            except Exception:
                log.error("round %d host processing failed:\n%s", fid, traceback.format_exc())
            if on_frame is not None:
                on_frame(fid, fetched)
            processed += self.batch
            return True

        def drain_all():
            nonlocal need_recovery
            while in_flight:
                if not drain_one():
                    need_recovery = True

        while True:
            if need_recovery:
                # The dispatched chain consumed a poisoned batched state:
                # drop queued work and restore the last good snapshot, like
                # the single-sequence System (one bad round must not abort
                # the fleet — src/main.cpp:48-54).
                drain_all()
                need_recovery = False
                if snap_state is not None:
                    state = jax.device_put(snap_state, self._shard)
                    log.warning("recovered batched state from snapshot")
                else:
                    state = jax.device_put(init_batched, self._shard)
                    log.warning("no snapshot; batched state re-initialized")

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
                self.failed_frames.append(frame_id)
                need_recovery = True
                continue
            in_flight.append((frame_id, handle, outputs))
            while len(in_flight) >= self.max_in_flight:
                if not drain_one():
                    need_recovery = True
                    break

            if (
                not need_recovery
                and self.snapshot_interval
                and frame_id % self.snapshot_interval == 0
            ):
                drain_all()  # snapshot only a state proven good
                if not need_recovery:
                    snap_state = jax.device_get(state)

            if (
                not need_recovery
                and self.checkpoint_path is not None
                and frame_id % self.checkpoint_interval == 0
            ):
                from ..runtime.checkpoint import save_checkpoint

                drain_all()  # sync host state with the saved device state
                if not need_recovery:
                    save_checkpoint(
                        self.checkpoint_path,
                        state,
                        frame_id,
                        {m.name: m.host_state() for m in self.pipeline.modules},
                    )

        drain_all()
        self.timing.end_timing(sys_handle)
        self.final_state = jax.device_get(state)
        return processed

    def _host_post_frame(self, frame_id, fetched, host_params):
        # Aggregate host-fetched keys per each module's declared reduction:
        # 'sum' keys (histograms) are summed over the batch so the shared
        # parameter provider sees fleet-wide statistics; undeclared keys
        # fall back to sequence 0 with a one-time warning (a blanket
        # batch-sum would silently corrupt non-additive outputs).
        for m in self.pipeline.modules:
            reduce_spec = m.host_fetch_reduce()
            sub = {}
            for k in m.host_fetch_keys():
                if k not in fetched:
                    continue
                v = fetched[k]
                how = reduce_spec.get(k)
                if how == "sum" and v.ndim >= 1:
                    sub[k] = v.sum(axis=0)
                else:
                    if how is None and k not in self._warned_keys:
                        self._warned_keys.add(k)
                        log.warning(
                            "multiseq: key '%s' of module %s declares no "
                            "batch reduction; using sequence 0 only",
                            k, m.name,
                        )
                    sub[k] = v[0] if v.ndim >= 1 else v
            updated = m.host_update(self.pipeline.ctx, frame_id, sub, system=self)
            if updated:
                host_params[m.name] = {**host_params.get(m.name, {}), **updated}

        # Host-computed per-run data + visualization run on sequence 0.
        sub0 = {k: v[0] for k, v in fetched.items()}
        for hm in self.host_modules:
            if not hm.provides_data():
                continue
            try:
                extra = hm.process(
                    self.pipeline.ctx, frame_id, {}, sub0, self.global_data
                )
            except Exception:
                log.error("host module %s process failed:\n%s", hm.name,
                          traceback.format_exc())
                continue
            if extra:
                sub0.update(extra)
        for hm in self.host_modules:
            try:
                img = hm.render(self.pipeline.ctx, frame_id, {}, sub0, self.global_data)
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


class SpatialMultiSeqSystem(MultiSeqSystem):
    """Composed DP x spatial driver: B sequences over a (seq, spatial)
    2-D mesh, each sequence's frame rows height-sharded.

    Config: ``{"parallel": {"mode": "spatial", "sequences": B}}`` — the
    16-chip shape "2 sequences x 8-way row sharding" in one program.
    Reuses the MultiSeqSystem loop (lock-step rounds, watchdogged drains,
    snapshot recovery, checkpointing, batch-summed histogram providers);
    only the mesh and the jitted step differ — the step is
    SpatialPipeline.jitted_batched_step, whose collectives name only the
    spatial axis so reductions stay within each sequence's subgroup.

    Inputs/state are placed batch-sharded over 'seq' (any-rank arrays);
    the shard_map's in_specs reshard rows over 'spatial' at dispatch.
    """

    def __init__(self, sources, pipeline, host_modules=(), *, mesh, **kw):
        super().__init__(
            sources, pipeline, host_modules,
            devices=list(mesh.devices.flat), **kw,
        )
        if len(sources) != mesh.shape["seq"]:
            raise ValueError(
                f"{len(sources)} sources for a {mesh.shape['seq']}-sequence "
                "mesh axis"
            )
        self.mesh = mesh
        self._shard = NamedSharding(mesh, P("seq"))
        self._repl = NamedSharding(mesh, P())

    @functools.lru_cache(maxsize=64)
    def _jitted(self, variant, fetch_keys: frozenset):
        return self.pipeline.jitted_batched_step(variant, fetch_keys)

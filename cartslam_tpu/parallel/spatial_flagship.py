"""Height-sharded pipeline: single-frame latency scaling over a mesh.

MultiSeqSystem (parallel/system.py) scales THROUGHPUT by sharding
independent sequences; one frame is still chip-local.  `SpatialPipeline`
shards a SINGLE frame's rows across a 1-D ``spatial`` mesh axis so the
module chain itself runs cooperatively on all chips — the scale-out
analogue of the reference's tiled shared-memory kernels
(include/utils/cuda.cuh:59-191), with `ppermute` row halos standing in
for the tile aprons and `psum` for the global reductions (label
statistics, vote tallies, histograms).

There is ONE source of truth for the stage math: the spatial step is the
production `runtime.pipeline.Pipeline` composition over the SAME module
list, with each module's ``compute_spatial`` (runtime/module.py) running
its ``compute`` math on a row shard.  Any module implementing
``compute_spatial`` is height-shardable from the same JSON config that
drives the single-chip mode (src/cartconfig.cpp:230-277); seam handling
lives next to each module's stage math:

  * SGM (models/disparity.py): BIT-EXACT for any shard count —
    horizontal sweeps are row-local and the vertical sweeps run a
    split-scan carry hand-off chain (parallel/sgm_sharded.py).
  * interpolate / derivative: edge-duplicated halos, one exchange per
    smoothing iteration — exact (edge duplication IS the ops' clamp
    convention).
  * optical flow (models/optflow.py): 'global' mode gathers the ~1 MB
    gray pair and runs the production pyramid verbatim (bit-exact);
    'sharded' mode runs per-shard apron pyramids at ~1/n the FLOPs.
  * contour relaxation (models/superpixels.py): `iterations * phases`-row
    halos + psum'd label moments — exact in both stats modes.
  * temporal vote (models/sp_planeseg.py, models/planeseg.py):
    `max_warp_y`-row halos of the packed vote stack, 'select' warp mode —
    exact for bounded warps.
  * per-label reductions (stats, votes) count core rows once, psum'd.

Halos must fit in one neighbor shard: halo <= H / n_devices (each
module's ``spatial_validate`` enforces its own bound).

The parity suite (tests/test_spatial_flagship.py) pins the sharded chain
against the full-frame production Pipeline bit-for-bit; because both
modes now trace the same `Module` methods, a new module or knob cannot
drift between them.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime.module import PipelineContext, SpatialContext
from ..runtime.pipeline import Pipeline


def _infer_row_dim(shape, height: int) -> int | None:
    """First dimension whose extent equals the global image height.

    The fallback convention behind Module.spatial_row_dims: state leaves
    and outputs shard over the mesh axis at their row dimension; arrays
    with no height-sized dimension stay replicated.
    """
    for i, s in enumerate(shape):
        if s == height:
            return i
    return None


class SpatialPipeline:
    """Pipeline-compatible height-sharded composer over real modules.

    Implements the subset of `runtime.pipeline.Pipeline`'s surface that
    `runtime.System` drives (ctx / modules / init_state /
    init_host_params / variant / jitted_step / host_fetch_keys /
    run_step_instrumented), so the standard System loop — prefetch,
    bounded in-flight queue, watchdog, snapshot recovery, checkpointing,
    host modules, timing — runs the height-sharded step unchanged, and
    every host-side module mechanism (provider cadence via host_update,
    host_state checkpointing) is the production implementation itself.
    """

    def __init__(
        self,
        mesh: Mesh,
        ctx: PipelineContext,
        modules,
        axis: str = "spatial",
        seq_axis: str = "seq",
    ):
        self.mesh = mesh
        self.ctx = ctx
        self.axis = axis
        self.seq_axis = seq_axis
        self.inner = Pipeline(ctx, modules)
        self.modules = self.inner.modules
        self.n = mesh.shape[axis]
        if ctx.height % self.n:
            raise ValueError(
                f"height {ctx.height} must divide the {self.n}-way "
                f"'{axis}' mesh axis"
            )
        self.h_local = ctx.height // self.n
        self.sp = SpatialContext(axis, self.n, self.h_local, ctx.height)
        self._provider = {}
        for m in self.modules:
            if not m.supports_spatial():
                raise ValueError(
                    f"module {m.name} does not support the spatial "
                    "latency mode (no compute_spatial); run it in "
                    "single-chip or multiseq mode"
                )
            m.spatial_validate(ctx, self.n, self.h_local)
            for key in m.provides():
                self._provider[key] = m
        self._hp_template = self.inner.init_host_params()

    # ------------------------------------------------- Pipeline interface

    def host_fetch_keys(self):
        return self.inner.host_fetch_keys()

    def init_state(self):
        return self.inner.init_state()

    def init_host_params(self):
        return self.inner.init_host_params()

    def variant(self, frame_id: int) -> tuple:
        return self.inner.variant(frame_id)

    # ------------------------------------------------------ spec derivation

    def _pspec(self, row_dim: int | None, batched: bool) -> P:
        lead = (self.seq_axis,) if batched else ()
        if row_dim is None:
            return P(*lead)
        return P(*lead, *([None] * row_dim), self.axis)

    def _output_row_dim(self, key: str) -> int | None:
        m = self._provider[key]
        over = m.spatial_row_dims(self.ctx)
        if key in over:
            return over[key]
        spec = m.output_spec(self.ctx).get(key)
        if spec is None:
            return None
        return _infer_row_dim(spec.shape, self.ctx.height)

    def _state_specs(self, batched: bool):
        mods = {}
        for m in self.modules:
            over = m.spatial_row_dims(self.ctx)
            d = {}
            for k, v in m.init_state(self.ctx).items():
                rd = over.get(k, _infer_row_dim(np.shape(v), self.ctx.height))
                d[k] = self._pspec(rd, batched)
            mods[m.name] = d
        hist = {}
        for key in self.inner.history_depth:
            rd = self._output_row_dim(key)
            hist[key] = self._pspec(None if rd is None else rd + 1, batched)
        return {"modules": mods, "history": hist}

    def state_sharding(self):
        """NamedSharding tree matching init_state (for jax.device_put)."""
        return jax.tree.map(
            lambda s: NamedSharding(self.mesh, s),
            self._state_specs(False),
            is_leaf=lambda x: isinstance(x, P),
        )

    def _frame_specs(self, frame_struct, batched: bool):
        d = {}
        for k, shp in frame_struct:
            core = shp[1:] if batched else shp
            rd = 0 if (len(core) >= 2 and core[0] == self.ctx.height) else None
            d[k] = self._pspec(rd, batched)
        return d

    def _out_keys(self, fetch_keys) -> frozenset:
        provided = frozenset(self._provider)
        if fetch_keys is None:
            return provided
        return frozenset(fetch_keys) & provided

    # ---------------------------------------------------------------- steps

    @functools.lru_cache(maxsize=64)
    def _get_jit(self, variant, fetch_keys, frame_struct, batched: bool):
        out_keys = self._out_keys(fetch_keys)
        step = self.inner.make_step(variant, out_keys, spatial=self.sp)
        state_specs = self._state_specs(batched)
        in_specs = (
            state_specs,
            self._frame_specs(frame_struct, batched),
            jax.tree.map(lambda _: P(), self._hp_template),
        )
        out_specs = (
            state_specs,
            {k: self._pspec(self._output_row_dim(k), batched)
             for k in out_keys},
        )

        if batched:
            seq = self.seq_axis

            def local(state, frame, host_params):
                # One sequence per (seq) group: drop the size-1 local
                # batch, run the row-shard step, re-batch.  Trace
                # constants (e.g. superpixels_max_label) are promoted to
                # seq-varying so every output shares one uniform spec.
                sq = lambda t: jax.tree.map(lambda x: x[0], t)
                ns, out = step(sq(state), sq(frame), host_params)

                def ex(x):
                    if seq not in jax.typeof(x).vma:
                        x = jax.lax.pcast(x, seq, to="varying")
                    return x[None]

                return jax.tree.map(ex, ns), jax.tree.map(ex, out)
        else:
            local = step

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            # The varying-manual-axes checker guards the whole step (the
            # r4 sharded-Pallas catch); scan inits inherit their inputs'
            # varying type (ops/stereo.py, ops/optflow.py).
            check_vma=True,
        )
        return jax.jit(fn, donate_argnums=(0,))

    def _step_caller(self, variant, fetch_keys, batched: bool):
        fk = None if fetch_keys is None else frozenset(fetch_keys)

        def call(state, frame, host_params):
            struct = tuple(
                sorted((k, tuple(np.shape(v))) for k, v in frame.items())
            )
            fn = self._get_jit(variant, fk, struct, batched)
            return fn(state, frame, host_params)

        return call

    def jitted_step(self, variant, fetch_keys=None):
        return self._step_caller(variant, fetch_keys, batched=False)

    def jitted_batched_step(self, variant, fetch_keys=None):
        """Composed DP x spatial step for SpatialMultiSeqSystem: a
        (seq, spatial) 2-D mesh scales BOTH ways at once — independent
        sequences shard over `seq_axis` while each sequence's frame rows
        shard over the spatial axis.  The local step is the SAME
        pipeline step; its collectives name only the spatial axis, so
        psums/ppermutes stay within each sequence's subgroup."""
        if self.seq_axis not in self.mesh.shape:
            raise ValueError(
                f"mesh must have axes ({self.seq_axis!r}, {self.axis!r})"
            )
        return self._step_caller(variant, fetch_keys, batched=True)

    def run_step_instrumented(self, state, frame, host_params, variant,
                              fetch_keys=None):
        """Single-row timing: the spatial step is one fused program, so
        per-module attribution does not exist; emit one 'spatial_step'
        row instead (use jax.profiler traces for op-level attribution)."""
        import time as _time

        step = self.jitted_step(variant, frozenset(fetch_keys or ()))
        t0 = _time.perf_counter()
        new_state, outputs = step(state, frame, host_params)
        jax.block_until_ready(outputs)
        t1 = _time.perf_counter()
        return new_state, outputs, [("spatial_step", t0, t0, t1)]


class SpatialFlagshipConfig(NamedTuple):
    """Knob bundle for the standalone flagship preset (benchmarks, the
    multichip dryrun, and the parity tests construct the chain without a
    JSON config).  `SpatialFlagship` maps it onto the production module
    list; the config path (config/registry.py) builds `SpatialPipeline`
    from the real modules directly and does not use this."""

    height: int
    width: int
    num_disparities: int = 256
    min_disparity: int = 4
    sgm_p1: int = 10
    sgm_p2: int = 120
    uniqueness: int = 12
    smoothing_radius: int = 2
    smoothing_iterations: int = 1
    block_size: int = 12
    iterations: int = 8
    initial_iterations: int = 24
    reset_iterations: int = 64
    image_weight: float = 1.5
    disparity_weight: float = 1.0
    compactness_weight: float = 0.1
    progressive_compactness_cost: float = 0.0
    direct_clique_cost: float = 0.5
    diagonal_clique_cost: float = 0.5 / np.sqrt(2.0)
    relax_phases: int = 1
    stats_refresh: str = "frame"
    temporal_distance: int = 3
    # Matches the production pipeline / registry default.
    max_warp_y: int = 32
    max_warp_x: int = 64
    flow_levels: int = 4
    flow_search: int = 4
    flow_refine: int = 2
    flow_base_level: int = 1
    flow_med_passes: int = 2
    # Unused since r4 (exact split-scan seams, parallel/sgm_sharded.py);
    # kept so existing configs/kwargs keep loading.
    sgm_halo: int = 24
    # Covers dense_flow's static vertical reach (42 px for the default
    # 4-level pyramid after the base_level upsample) plus window margin.
    # Used by flow_mode='sharded' only.
    flow_halo: int = 46
    # 'global' (default): bit-exact gathered pyramid; 'sharded':
    # per-shard apron pyramids (see models/optflow.py).
    flow_mode: str = "global"
    # Whole-pipeline grayscale switch: frames arrive single-channel from
    # the System source boundary (CARTSLAM_IMAGE_MAKE_GRAYSCALE).
    grayscale: bool = False
    axis: str = "spatial"


class SpatialFlagship:
    """The flagship preset as a ready-made SpatialPipeline.

    Builds the SAME six production modules the benched single-chip
    flagship runs (disparity -> derivative -> depth -> flow ->
    superpixels -> superpixel planeseg) and height-shards them over
    `mesh` — a convenience for benchmarks and the multichip dryrun; the
    step math lives entirely in the modules' compute_spatial methods.
    """

    def __init__(self, mesh: Mesh, config: SpatialFlagshipConfig,
                 q=None, ranges=((3, 40), (-6, 3))):
        from .. import models
        from ..utils.plane_params import StaticPlaneParameterProvider

        c = config
        self.cfg = c
        self.mesh = mesh
        if q is None:
            q = np.eye(4, dtype=np.float32)
        ctx = PipelineContext(
            height=c.height, width=c.width,
            q=np.asarray(q, np.float32), grayscale=c.grayscale,
        )
        sup = models.SuperPixelModule(
            (c.height, c.width),
            initial_iterations=c.initial_iterations,
            iterations=c.iterations,
            block_size=c.block_size,
            reset_iterations=c.reset_iterations,
            direct_clique_cost=c.direct_clique_cost,
            diagonal_clique_cost=c.diagonal_clique_cost,
            compactness_weight=c.compactness_weight,
            progressive_compactness_cost=c.progressive_compactness_cost,
            image_weight=c.image_weight,
            disparity_weight=c.disparity_weight,
            relax_phases=c.relax_phases,
            stats_refresh=c.stats_refresh,
        )
        modules = [
            models.ImageDisparityModule(
                (c.height, c.width),
                min_disparity=c.min_disparity,
                num_disparities=c.num_disparities,
                smoothing_radius=c.smoothing_radius,
                smoothing_iterations=c.smoothing_iterations,
                p1=c.sgm_p1, p2=c.sgm_p2, uniqueness=c.uniqueness,
            ),
            models.ImageDisparityDerivativeModule(),
            models.DepthModule(),
            models.ImageOpticalFlowModule(
                (c.height, c.width),
                levels=c.flow_levels, search=c.flow_search,
                refine=c.flow_refine, base_level=c.flow_base_level,
                med_passes=c.flow_med_passes,
                spatial_mode=c.flow_mode, spatial_halo=c.flow_halo,
            ),
            sup,
            models.SuperPixelDisparityPlaneSegmentationModule(
                StaticPlaneParameterProvider(*ranges),
                num_labels=sup.num_labels,
                use_temporal_smoothing=True,
                temporal_smoothing_distance=c.temporal_distance,
                warp_mode="select",
                max_warp_y=c.max_warp_y, max_warp_x=c.max_warp_x,
            ),
        ]
        self.pipeline = SpatialPipeline(mesh, ctx, modules, axis=c.axis)
        self.h_local = self.pipeline.h_local
        self.max_label_id = sup.max_label_id
        self.num_labels = sup.num_labels

    # ------------------------------------------------------------- surface

    def init_state(self):
        return self.pipeline.init_state()

    def state_sharding(self):
        return self.pipeline.state_sharding()

    def init_params(self):
        return self.pipeline.init_host_params()

    def variant(self, frame_id: int) -> tuple:
        return self.pipeline.variant(frame_id)

    def _variant_arg(self, variant):
        if variant is None:
            variant = "normal"
        if isinstance(variant, str):
            fid = {"initial": 1, "reset": self.cfg.reset_iterations,
                   "normal": self.cfg.reset_iterations + 1}[variant]
            return self.pipeline.variant(fid)
        return variant

    def make_step(self, variant=None):
        return self.pipeline.jitted_step(self._variant_arg(variant))

    def make_batched_step(self, variant=None, seq_axis: str = "seq"):
        return self.pipeline.jitted_batched_step(self._variant_arg(variant))

"""JSON config reader + module registry.

Schema identical to the reference (src/cartconfig.cpp:230-277):
    {"data_source": {"type": ..., ...}, "modules": [{"type": ..., ...}, ...]}
or two files (source config + modules config).  Module type strings and
per-type parameter defaults match src/cartconfig.cpp:106-228; the
compile-time string-hash switch becomes a plain dict registry.
"""

from __future__ import annotations

import json
import os
import numpy as np

from .. import models
from ..runtime.module import HostModule, Module, PipelineContext
from ..runtime.pipeline import Pipeline
from ..runtime.system import System
from ..sources import (
    DataSource,
    KITTIDataSource,
    SyntheticDataSource,
    ZEDDataSource,
)
from ..utils.plane_params import (
    HistogramPeakPlaneParameterProvider,
    StaticPlaneParameterProvider,
)


def _read_parameter_provider(cfg: dict):
    """reference: src/cartconfig.cpp:56-80."""
    ptype = cfg["type"]
    if ptype == "static":
        h = (cfg["horizontal_range_min"], cfg["horizontal_range_max"])
        v = (cfg["vertical_range_min"], cfg["vertical_range_max"])
        return StaticPlaneParameterProvider(h, v)
    if ptype == "histogram_peak":
        return HistogramPeakPlaneParameterProvider()
    raise ValueError(f"unknown parameter provider type '{ptype}'")


def create_data_source(cfg: dict):
    """reference: src/cartconfig.cpp:82-104 (+ synthetic test source)."""
    stype = cfg["type"]
    if stype == "kitti":
        return KITTIDataSource(
            cfg["path"], cfg.get("sequence", 0),
            decode_workers=cfg.get("decode_workers", 6),
        )
    if stype == "zed":
        return ZEDDataSource(
            cfg["path"],
            cfg.get("include_disparity", False),
            real_time_mode=cfg.get("svo_real_time_mode", False),
            fps=cfg.get("fps", 15.0),
            decode_workers=cfg.get("decode_workers", 6),
        )
    if stype == "synthetic":
        return SyntheticDataSource(
            image_size=tuple(cfg.get("image_size", (96, 192))),
            num_frames=cfg.get("num_frames", 20),
            seed=cfg.get("seed", 0),
        )
    raise ValueError(f"unknown data source type '{stype}'")


class ConfigState:
    """Carries cross-module wiring facts during config interpretation."""

    def __init__(self, image_size: tuple[int, int]):
        self.image_size = image_size
        self.superpixel_module: models.SuperPixelModule | None = None

    def num_superpixel_labels(self) -> int:
        if self.superpixel_module is None:
            raise ValueError("this module requires a 'superpixels' module")
        return self.superpixel_module.num_labels


def _build_module(cfg: dict, st: ConfigState):
    """Returns (Module | HostModule | None). Defaults mirror cartconfig.cpp."""
    mtype = cfg["type"]
    g = cfg.get

    if mtype == "disparity":
        return models.ImageDisparityModule(
            st.image_size,
            min_disparity=g("min_disparity", 4),
            num_disparities=g("num_disparities", 256),
            block_size=g("block_size", 3),
            smoothing_radius=g("smoothing_radius", -1),
            smoothing_iterations=g("smoothing_iterations", 5),
        )
    if mtype == "zed_disparity":
        return models.ZEDImageDisparityModule(
            smoothing_radius=g("smoothing_radius", -1),
            smoothing_iterations=g("smoothing_iterations", 5),
        )
    if mtype == "disparity_derivative":
        return models.ImageDisparityDerivativeModule()
    if mtype == "depth":
        return models.DepthModule()
    if mtype == "optflow":
        return models.ImageOpticalFlowModule(
            st.image_size,
            levels=g("levels", 4),
            search=g("search", 4),
            refine=g("refine", 2),
            base_level=g("base_level", 1),
            med_passes=g("med_passes", 2),
        )
    if mtype == "superpixels":
        direct = g("direct_clique_cost", 0.5)
        m = models.SuperPixelModule(
            st.image_size,
            initial_iterations=g("initial_iterations", 18),
            iterations=g("iterations", 6),
            block_size=g("block_size", 12),
            reset_iterations=g("reset_iterations", 64),
            direct_clique_cost=direct,
            diagonal_clique_cost=g("diagonal_clique_cost", direct / np.sqrt(2)),
            compactness_weight=g("compactness_weight", 0.1),
            progressive_compactness_cost=g("progressive_compactness_cost", 0.0),
            image_weight=g("image_weight", 1.5),
            disparity_weight=g("disparity_weight", 1.0),
            relax_phases=g("relax_phases", 1),
            stats_refresh=g("stats_refresh", "frame"),
        )
        st.superpixel_module = m
        return m
    if mtype == "disparity_planeseg":
        return models.DisparityPlaneSegmentationModule(
            _read_parameter_provider(cfg["parameter_provider"]),
            update_interval=g("update_interval", 30),
            reset_interval=g("reset_interval", 10),
            use_temporal_smoothing=g("use_temporal_smoothing", False),
            temporal_smoothing_distance=g("temporal_smoothing_distance", 3),
            temporal_mode=g("temporal_mode", "carried"),
            warp_mode=g("warp_mode", "auto"),
            max_warp_y=g("max_warp_y", 32),
            max_warp_x=g("max_warp_x", 64),
        )
    if mtype == "superpixel_disparity_planeseg":
        return models.SuperPixelDisparityPlaneSegmentationModule(
            _read_parameter_provider(cfg["parameter_provider"]),
            num_labels=st.num_superpixel_labels(),
            update_interval=g("update_interval", 30),
            reset_interval=g("reset_interval", 10),
            use_temporal_smoothing=g("use_temporal_smoothing", False),
            temporal_smoothing_distance=g("temporal_smoothing_distance", 3),
            temporal_mode=g("temporal_mode", "carried"),
            warp_mode=g("warp_mode", "auto"),
            max_warp_y=g("max_warp_y", 32),
            max_warp_x=g("max_warp_x", 64),
        )

    # Visualization modules are host-side.
    from ..viz import host_modules as vm

    if mtype == "disparity_visualization":
        return vm.DisparityVisualization()
    if mtype == "disparity_derivative_visualization":
        return vm.DerivativeVisualization()
    if mtype == "depth_visualization":
        return vm.DepthVisualization()
    if mtype == "optflow_visualization":
        return vm.OpticalFlowVisualization(points=g("points", 10))
    if mtype == "superpixels_visualization":
        return vm.SuperPixelVisualization()
    if mtype == "disparity_planeseg_visualization":
        return vm.PlaneSegmentationVisualization(
            show_histogram=g("show_histogram", True),
            show_unsmoothed=g("show_unsmoothed", True),
        )
    if mtype == "bev_planeseg_visualization":
        return vm.BEVVisualization()
    if mtype == "features":
        from .registry_extra import build_features_module

        return build_features_module(cfg, st)
    if mtype == "features_visualization":
        return vm.FeatureVisualization()
    if mtype == "planefit":
        from .registry_extra import build_planefit_module

        return build_planefit_module(cfg, st)
    if mtype == "planefit_visualization":
        return vm.PlaneFitVisualization()
    if mtype == "planecluster":
        from .registry_extra import build_planecluster_module

        return build_planecluster_module(cfg, st)

    raise ValueError(f"unknown module type '{mtype}'")


def _warn_warp_bound(modules):
    """Surface the max_warp_y <-> dense_flow coupling (ADVICE r3): in
    'select' warp mode, temporal votes whose flow exceeds the warp bound
    are dropped (the current frame still votes with weight 2); 'gather'
    mode keeps them.  Warn when the configured flow can actually exceed
    the bound so the tradeoff is a visible choice, not a silent one."""
    from ..models.optflow import ImageOpticalFlowModule
    from ..ops.optflow import flow_bound

    flows = [m for m in modules if isinstance(m, ImageOpticalFlowModule)]
    segs = [
        m
        for m in modules
        if getattr(m, "temporal", False) and hasattr(m, "max_warp_y")
    ]
    if not flows or not segs:
        return
    f = flows[0]
    bound = flow_bound(
        levels=f.levels, search=f.search, refine=f.refine,
        base_level=f.base_level, fine_refine=getattr(f, "fine_refine", 1),
    )
    for m in segs:
        if m.warp_mode in ("auto", "select") and m.max_warp_y < bound:
            import logging

            logging.getLogger("cart.config").warning(
                "dense_flow's static vertical bound is %d px but "
                "max_warp_y=%d: temporal votes with larger vertical flow "
                "are dropped in 'select' warp mode (raise max_warp_y or "
                "set warp_mode='gather' to keep them)",
                bound, m.max_warp_y,
            )


def _replicate_sources(parallel: dict, source_cfg: dict, source, batch: int,
                       image_size: tuple[int, int]):
    """B sources for a lock-step parallel run: `parallel.sources` configs,
    or the primary config replicated (per-sequence variation where the
    source type supports it)."""
    src_cfgs = parallel.get("sources")
    if src_cfgs is None:
        src_cfgs = []
        for i in range(batch):
            c = dict(source_cfg)
            if c.get("type") == "synthetic":
                c["seed"] = int(c.get("seed", 0)) + i
            src_cfgs.append(c)
    if len(src_cfgs) != batch:
        raise ValueError(
            "parallel.sources length must equal the sequence count"
        )
    sources = [source if i == 0 else create_data_source(c)
               for i, c in enumerate(src_cfgs)]
    for s in sources:
        if s.get_image_size() != image_size:
            raise ValueError("all parallel sources must share image size")
    return sources


def _split_multiseq_kwargs(system_kwargs: dict):
    """(accepted, dropped) split of System options for MultiSeqSystem."""
    ms_keys = {
        "checkpoint_path", "checkpoint_interval", "resume_from",
        "data_timeout", "snapshot_interval",
    }
    accepted = {k: v for k, v in system_kwargs.items() if k in ms_keys}
    dropped = {
        k: v for k, v in system_kwargs.items() if v and k not in ms_keys
    }
    if dropped:
        import logging

        logging.getLogger("cart.config").warning(
            "multi-sequence mode ignores system options: %s", sorted(dropped)
        )
    return accepted, dropped


def _build_spatial_pipeline(parallel: dict, ctx, modules, source_cfg):
    """Height-shard the configured module list as ONE spatial program.

    The SAME modules the single-chip Pipeline would run are composed by
    `SpatialPipeline` through their `compute_spatial` methods — no
    parameter transfer, no fixed chain: any module list whose members
    implement compute_spatial is spatially shardable, and a module that
    doesn't is rejected with a per-module error (run it in single-chip
    or multiseq mode).
    """
    import jax
    from jax.sharding import Mesh

    from ..models.optflow import ImageOpticalFlowModule
    from ..parallel.spatial_flagship import SpatialPipeline

    n = int(parallel.get("devices", len(jax.devices())))
    seqs = int(parallel.get("sequences", 1))
    if seqs > 1:
        # Composed DP x spatial: a (seq, spatial) 2-D mesh — `sequences`
        # independent sources, each height-sharded over n/sequences chips
        # (parallel/system.py:SpatialMultiSeqSystem).
        if n % seqs:
            raise ValueError(
                f"parallel.devices={n} must divide by sequences={seqs}"
            )
        n_sp = n // seqs
        mesh = Mesh(
            np.array(jax.devices()[:n]).reshape(seqs, n_sp),
            ("seq", "spatial"),
        )
    else:
        n_sp = n
        mesh = Mesh(np.array(jax.devices()[:n]), ("spatial",))
    h_local = ctx.height // n_sp if ctx.height % n_sp == 0 else 0

    # Flow seam knobs live under `parallel` (they describe the sharding,
    # not the flow math); apply them to the flow module's spatial attrs.
    for m in modules:
        if isinstance(m, ImageOpticalFlowModule):
            if "flow_mode" in parallel:
                m.spatial_mode = str(parallel["flow_mode"])
            if "flow_halo" in parallel:
                m.spatial_halo = int(parallel["flow_halo"])
            elif h_local and m.spatial_mode == "sharded":
                # Approximation-depth default: the apron cannot exceed
                # one shard's rows.
                m.spatial_halo = min(m.spatial_halo, h_local)

    return SpatialPipeline(mesh, ctx, modules)


def build_system(
    source_cfg: dict,
    modules_cfg: list[dict],
    *,
    grayscale: bool = False,
    timing=None,
    image_sink=None,
    max_frames: int | None = None,
    max_in_flight: int = 4,
    extra_fetch_keys=(),
    parallel: dict | None = None,
    **system_kwargs,
) -> System:
    if isinstance(source_cfg, DataSource):
        source = source_cfg  # pre-constructed (e.g. PreloadedSource)
    else:
        source = create_data_source(source_cfg)
    h, w = source.get_image_size()
    st = ConfigState((h, w))

    modules: list[Module] = []
    host_modules: list[HostModule] = []
    for cfg in modules_cfg:
        m = _build_module(cfg, st)
        if isinstance(m, HostModule):
            host_modules.append(m)
        elif m is not None:
            modules.append(m)
    _warn_warp_bound(modules)

    ctx = PipelineContext(
        height=h,
        width=w,
        q=np.asarray(source.get_camera_intrinsics().q, np.float32),
        grayscale=grayscale,
    )

    if parallel is not None:
        mode = parallel.get("mode", "multiseq")
        if mode not in ("multiseq", "spatial"):
            raise ValueError(f"unknown parallel mode '{mode}'")
        if mode == "spatial":
            # Height-sharded single-frame LATENCY mode: the flagship chain
            # itself runs cooperatively over the mesh
            # (parallel/spatial_flagship.py).  The standard System loop
            # drives it through the Pipeline-compatible facade, so timing,
            # watchdog, recovery, checkpointing, and host modules all work.
            # With "sequences": B > 1 the mesh is 2-D (seq, spatial) and
            # B sources run through the composed DP x spatial driver.
            spatial = _build_spatial_pipeline(
                parallel, ctx, modules, source_cfg
            )
            seqs = int(parallel.get("sequences", 1))
            if seqs > 1:
                from ..parallel.system import SpatialMultiSeqSystem

                sources = _replicate_sources(
                    parallel, source_cfg, source, seqs, (h, w)
                )
                ms_kwargs, _ = _split_multiseq_kwargs(system_kwargs)
                return SpatialMultiSeqSystem(
                    sources,
                    spatial,
                    host_modules,
                    mesh=spatial.mesh,
                    timing=timing,
                    image_sink=image_sink,
                    max_frames=max_frames,
                    max_in_flight=max_in_flight,
                    extra_fetch_keys=extra_fetch_keys,
                    **ms_kwargs,
                )
            return System(
                source,
                spatial,
                host_modules,
                timing=timing,
                image_sink=image_sink,
                max_frames=max_frames,
                max_in_flight=max_in_flight,
                extra_fetch_keys=extra_fetch_keys,
                **system_kwargs,
            )
        pipeline = Pipeline(ctx, modules)
        if "multihost" in parallel:
            # DCN across hosts; afterwards jax.devices() spans the fleet
            # and the data mesh below covers it (SURVEY §5.8).
            from ..parallel.distributed import initialize_multihost

            initialize_multihost(parallel["multihost"])
        batch = int(parallel.get("batch", len(__import__("jax").devices())))
        sources = _replicate_sources(parallel, source_cfg, source, batch, (h, w))

        from ..parallel.system import MultiSeqSystem

        ms_kwargs, _ = _split_multiseq_kwargs(system_kwargs)
        return MultiSeqSystem(
            sources,
            pipeline,
            host_modules,
            timing=timing,
            image_sink=image_sink,
            max_frames=max_frames,
            max_in_flight=max_in_flight,
            extra_fetch_keys=extra_fetch_keys,
            **ms_kwargs,
        )

    pipeline = Pipeline(ctx, modules)
    return System(
        source,
        pipeline,
        host_modules,
        timing=timing,
        image_sink=image_sink,
        max_frames=max_frames,
        max_in_flight=max_in_flight,
        extra_fetch_keys=extra_fetch_keys,
        **system_kwargs,
    )


def read_system_config(*paths: str, **kwargs) -> System:
    """One combined config, or (source_config, modules_config) pair."""
    def load(p):
        with open(os.path.expanduser(p)) as f:
            return json.load(f)

    if len(paths) == 1:
        data = load(paths[0])
        if "data_source" not in data or "modules" not in data:
            raise ValueError("config must contain data_source and modules")
        if data.get("grayscale"):
            kwargs["grayscale"] = True
        if "parallel" in data:
            kwargs.setdefault("parallel", data["parallel"])
        return build_system(data["data_source"], data["modules"], **kwargs)
    if len(paths) == 2:
        return build_system(load(paths[0]), load(paths[1]), **kwargs)
    raise ValueError("expected 1 or 2 config paths")

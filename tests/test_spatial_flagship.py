"""Height-sharded flagship step vs the PRODUCTION pipeline (8-CPU mesh).

VERDICT r3 items 3+4: the spatial mode's parity reference is the real
`runtime.pipeline.Pipeline` flagship at matching parameters — not
SpatialFlagship on one device — so a systematic semantic divergence
between the sharded chain and the benched chain cannot hide behind
shard-count invariance.  A second test drives the spatial mode through
the JSON config / System loop end-to-end, exercising the superpixel
reset/initial variants and the histogram-peak provider cadence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartslam_tpu.parallel.spatial_flagship import (
    SpatialFlagship, SpatialFlagshipConfig,
)


@pytest.fixture(autouse=True, scope="module")
def _no_compile_cache():
    """Serializing this module's shard_map executables into the persistent
    compile cache segfaults the CPU backend (observed in
    jax compilation_cache.put_executable_and_time); keep these compiles
    session-local.  The cache object is initialized once, so unsetting the
    dir after first use is a no-op — the min-compile-time threshold IS
    consulted at write time, so raise it beyond reach instead."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("spatial",))


def _frames(h, w, n, seed=0):
    from cartslam_tpu.sources.synthetic import SyntheticDataSource

    src = SyntheticDataSource(image_size=(h, w), num_frames=n, seed=seed)
    out = []
    while not src.is_finished():
        f = src.get_next()
        if f is None:
            break
        out.append(f)
    return out


# Small geometry; flow pyramid shrunk so its static reach (10 px) fits
# inside the 12-row halo — flow seams are then near-exact and parity
# against the full-frame pipeline is tight.
_CFG = dict(
    num_disparities=32, min_disparity=1, block_size=8,
    iterations=4, initial_iterations=6, reset_iterations=4,
    sgm_halo=12, flow_halo=12, max_warp_y=8,
    flow_levels=3, flow_search=2, flow_refine=1, flow_base_level=1,
)
_RANGES = ((3, 40), (-6, 3))


def _pipeline_reference(cfg: SpatialFlagshipConfig, frames, q):
    """The PRODUCTION flagship Pipeline at matching parameters."""
    from cartslam_tpu import models
    from cartslam_tpu.runtime.module import PipelineContext
    from cartslam_tpu.runtime.pipeline import Pipeline
    from cartslam_tpu.utils.plane_params import StaticPlaneParameterProvider

    mods = [
        models.ImageDisparityModule(
            (cfg.height, cfg.width),
            min_disparity=cfg.min_disparity,
            num_disparities=cfg.num_disparities,
            smoothing_radius=cfg.smoothing_radius,
            smoothing_iterations=cfg.smoothing_iterations,
            p1=cfg.sgm_p1, p2=cfg.sgm_p2, uniqueness=cfg.uniqueness,
        ),
        models.ImageDisparityDerivativeModule(),
        models.DepthModule(),
        models.SuperPixelModule(
            (cfg.height, cfg.width),
            initial_iterations=cfg.initial_iterations,
            iterations=cfg.iterations,
            block_size=cfg.block_size,
            reset_iterations=cfg.reset_iterations,
            direct_clique_cost=cfg.direct_clique_cost,
            diagonal_clique_cost=cfg.diagonal_clique_cost,
            compactness_weight=cfg.compactness_weight,
            image_weight=cfg.image_weight,
            disparity_weight=cfg.disparity_weight,
            stats_refresh="frame",
        ),
        models.ImageOpticalFlowModule(
            (cfg.height, cfg.width),
            levels=cfg.flow_levels, search=cfg.flow_search,
            refine=cfg.flow_refine, base_level=cfg.flow_base_level,
        ),
    ]
    sp = models.SuperPixelDisparityPlaneSegmentationModule(
        StaticPlaneParameterProvider(*_RANGES),
        num_labels=mods[3].num_labels,
        use_temporal_smoothing=True,
        temporal_smoothing_distance=cfg.temporal_distance,
        warp_mode="select",
        max_warp_y=cfg.max_warp_y, max_warp_x=cfg.max_warp_x,
    )
    mods.append(sp)
    ctx = PipelineContext(height=cfg.height, width=cfg.width, q=q)
    pipeline = Pipeline(ctx, mods)

    fetch = frozenset({
        "disparity", "disparity_derivative_histogram", "superpixels",
        "planes", "planes_unsmoothed", "depth",
    })
    state = jax.device_put(pipeline.init_state())
    hp = pipeline.init_host_params()
    outs = []
    for i, f in enumerate(frames):
        frame = {
            "left": f["left"], "right": f["right"],
            "frame_id": np.int32(i + 1),
        }
        step = pipeline.jitted_step(pipeline.variant(i + 1), fetch)
        state, out = step(state, frame, hp)
        outs.append(jax.device_get(out))
    return outs


@pytest.mark.parametrize("flow_mode", ["global", "sharded"])
def test_spatial_matches_production_pipeline(mesh, flow_mode):
    """8-way row sharding vs the production Pipeline at matching params.

    r4: SGM seams are BIT-EXACT (split-scan carry chain,
    parallel/sgm_sharded.py) and the default flow mode gathers the gray
    pair to run the production pyramid verbatim — so EVERY output,
    including the temporally-voted planes, must match the production
    Pipeline exactly.  flow_mode='sharded' (per-shard apron pyramids,
    ~1/n the flow FLOPs) keeps a 0.98 agreement gate on the voted
    planes only.  Runs through a reset frame (reset_iterations=4) so
    the variant cadence is compared too."""
    h, w = 96, 128  # 8 shards of 12 rows
    cfg = SpatialFlagshipConfig(height=h, width=w, flow_mode=flow_mode,
                                **_CFG)
    q = np.eye(4, dtype=np.float32)
    q[2, 2], q[2, 3] = 0.0, 120.0
    q[3, 2], q[3, 3] = 2.0, 0.0
    frames = _frames(h, w, 4)

    ref = _pipeline_reference(cfg, frames, q)

    sf = SpatialFlagship(mesh, cfg, q=q, ranges=_RANGES)
    shard = NamedSharding(mesh, P("spatial"))
    state = jax.device_put(sf.init_state(), sf.state_sharding())
    params = sf.init_params()

    with mesh:
        for i, f in enumerate(frames):
            fid = i + 1
            step = sf.make_step(sf.variant(fid))
            frame = {
                "left": jax.device_put(f["left"], shard),
                "right": jax.device_put(f["right"], shard),
                "frame_id": np.int32(fid),
            }
            state, out = step(state, frame, params)
            got = jax.device_get(out)
            want = ref[i]

            np.testing.assert_array_equal(
                got["disparity"], want["disparity"], err_msg=f"frame {i}"
            )
            np.testing.assert_array_equal(
                got["disparity_derivative_histogram"],
                want["disparity_derivative_histogram"],
                err_msg=f"frame {i}",
            )
            # Depth is pointwise in the (now bit-equal) disparity.
            np.testing.assert_allclose(
                got["depth"], want["depth"], rtol=1e-5, atol=1e-4
            )
            np.testing.assert_array_equal(
                got["superpixels"], want["superpixels"], err_msg=f"frame {i}"
            )
            np.testing.assert_array_equal(
                got["planes_unsmoothed"], want["planes_unsmoothed"],
                err_msg=f"frame {i}",
            )
            if flow_mode == "global":
                np.testing.assert_array_equal(
                    got["planes"], want["planes"], err_msg=f"frame {i}"
                )
            else:
                # Per-shard flow pyramids shift their decimation grids,
                # the sharded flow mode's documented approximation.
                plane_agree = (got["planes"] == want["planes"]).mean()
                assert plane_agree > 0.98, (i, plane_agree)


def test_spatial_mode_config_reachable(mesh, tmp_path):
    """`parallel.mode: "spatial"` drives the full System loop from one
    JSON config (reference: one-config reachability,
    src/cartconfig.cpp:230-277), including the histogram-peak provider
    cadence and the superpixel reset variant."""
    import json

    from cartslam_tpu.config.registry import read_system_config
    from cartslam_tpu.parallel.spatial_flagship import SpatialPipeline

    h, w = 96, 128
    config = {
        "data_source": {
            "type": "synthetic", "image_size": [h, w], "num_frames": 5,
        },
        "parallel": {"mode": "spatial", "devices": 8},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1,
             "smoothing_radius": 2, "smoothing_iterations": 1},
            {"type": "disparity_derivative"},
            {"type": "depth"},
            {"type": "optflow", "levels": 3, "search": 2, "refine": 1},
            {"type": "superpixels", "block_size": 8, "iterations": 4,
             "initial_iterations": 6, "reset_iterations": 4},
            {"type": "superpixel_disparity_planeseg",
             "parameter_provider": {"type": "histogram_peak"},
             "update_interval": 2, "use_temporal_smoothing": True,
             "max_warp_y": 8},
        ],
    }
    path = tmp_path / "spatial.json"
    path.write_text(json.dumps(config))

    system = read_system_config(str(path), extra_fetch_keys=["planes"])
    assert isinstance(system.pipeline, SpatialPipeline)

    seen = {}

    def on_frame(fid, fetched):
        seen[fid] = fetched["planes"].shape

    n = system.run(on_frame=on_frame)
    assert n == 5
    assert system.failed_frames == []
    assert seen[5] == (h, w)
    # The provider cadence ran: update_interval=2 refreshes ranges at
    # frames 1, 3, 5 from the accumulated histogram.
    from cartslam_tpu.models.sp_planeseg import (
        SuperPixelDisparityPlaneSegmentationModule,
    )

    sp = [m for m in system.pipeline.modules
          if isinstance(m, SuperPixelDisparityPlaneSegmentationModule)][0]
    assert sp._running is not None
    ranges = sp.provider.get().ranges_array()
    assert ranges.shape == (2, 2)


def test_spatial_rejects_unsupported_modules(mesh):
    """Modules without a compute_spatial (ORB features' static top-K is
    not row-decomposable) are rejected per-module with a clear error —
    the old fixed-chain whitelist is gone (any module list whose members
    implement compute_spatial shards)."""
    from cartslam_tpu.config.registry import build_system

    cfg = {
        "data_source": {"type": "synthetic", "image_size": [96, 128]},
    }
    mods = [
        {"type": "disparity", "num_disparities": 32},
        {"type": "features"},
    ]
    with pytest.raises(ValueError, match="compute_spatial"):
        build_system(
            cfg["data_source"], mods, parallel={"mode": "spatial"}
        )


def test_composed_seq_x_spatial_mesh(mesh):
    """DP x spatial composition: a 2-D (seq, spatial) mesh runs two
    sequences, each height-sharded 4-way, in ONE program — bit-equal per
    sequence to the 1-D spatial mode (whose parity reference is the
    production Pipeline).  The local step's collectives name only the
    spatial axis, so reductions stay within each sequence's subgroup."""
    import numpy as np
    from jax.sharding import Mesh

    h, w = 96, 128
    cfg = SpatialFlagshipConfig(height=h, width=w, **_CFG)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2d = Mesh(devs, ("seq", "spatial"))
    mesh1d = Mesh(np.array(jax.devices()[:4]), ("spatial",))

    frames_a = _frames(h, w, 2, seed=0)
    frames_b = _frames(h, w, 2, seed=7)

    # Reference: the 1-D spatial flagship per sequence.
    def run_1d(frames):
        sf = SpatialFlagship(mesh1d, cfg, ranges=_RANGES)
        state = jax.device_put(sf.init_state())
        params = sf.init_params()
        outs = []
        with mesh1d:
            for i, f in enumerate(frames):
                step = sf.make_step(sf.variant(i + 1))
                frame = {"left": f["left"], "right": f["right"],
                         "frame_id": np.int32(i + 1)}
                state, out = step(state, frame, params)
                outs.append(jax.device_get(out))
        return outs

    ref_a = run_1d(frames_a)
    ref_b = run_1d(frames_b)

    sf2 = SpatialFlagship(mesh2d, cfg, ranges=_RANGES)
    params = sf2.init_params()
    state = jax.tree.map(lambda v: np.stack([v, v]), sf2.init_state())
    with mesh2d:
        for i in range(2):
            step = sf2.make_batched_step(sf2.variant(i + 1))
            frame = {
                "left": np.stack([frames_a[i]["left"], frames_b[i]["left"]]),
                "right": np.stack(
                    [frames_a[i]["right"], frames_b[i]["right"]]
                ),
                "frame_id": np.asarray([i + 1, i + 1], np.int32),
            }
            state, out = step(state, frame, params)
            got = jax.device_get(out)
            for s, want in ((0, ref_a[i]), (1, ref_b[i])):
                for key in ("disparity", "superpixels", "planes",
                            "planes_unsmoothed",
                            "disparity_derivative_histogram"):
                    np.testing.assert_array_equal(
                        got[key][s], want[key], err_msg=f"seq {s} {key}"
                    )


def test_composed_mode_config_reachable(mesh, tmp_path):
    """`parallel: {"mode": "spatial", "sequences": 2}` drives the composed
    DP x spatial system from one JSON config: 2 sources on a (2, 4) mesh,
    provider histograms batch-summed, full System-loop fault surface."""
    import json

    from cartslam_tpu.config.registry import read_system_config
    from cartslam_tpu.parallel.system import SpatialMultiSeqSystem

    h, w = 96, 128
    config = {
        "data_source": {
            "type": "synthetic", "image_size": [h, w], "num_frames": 3,
        },
        "parallel": {"mode": "spatial", "devices": 8, "sequences": 2},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1},
            {"type": "disparity_derivative"},
            {"type": "optflow", "levels": 3, "search": 2, "refine": 1},
            {"type": "superpixels", "block_size": 8, "iterations": 4,
             "initial_iterations": 6},
            {"type": "superpixel_disparity_planeseg",
             "parameter_provider": {"type": "histogram_peak"},
             "update_interval": 2, "use_temporal_smoothing": True,
             "max_warp_y": 8},
        ],
    }
    path = tmp_path / "spatial_composed.json"
    path.write_text(json.dumps(config))
    system = read_system_config(str(path), extra_fetch_keys=["planes"])
    assert isinstance(system, SpatialMultiSeqSystem)
    assert system.mesh.shape == {"seq": 2, "spatial": 4}

    seen = {}

    def on_frame(fid, fetched):
        seen[fid] = fetched["planes"].shape

    n = system.run(on_frame=on_frame)
    assert n == 6  # 3 lock-step rounds x 2 sequences
    assert system.failed_frames == []
    assert seen[3] == (2, h, w)  # per-sequence batch axis

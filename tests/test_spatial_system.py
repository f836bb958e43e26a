"""System-level spatial/composed mode tests: checkpoint/resume and
fault recovery through the production System loop (8-CPU mesh).

Split from test_spatial_flagship.py for xdist loadfile balance — that
module holds the (long) production-parity sweeps.
"""

import jax
import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _no_compile_cache():
    """Serializing shard_map executables into the persistent compile
    cache segfaults the CPU backend; keep these compiles session-local
    (see test_spatial_flagship.py)."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    return Mesh(np.array(devs[:8]), ("spatial",))


def _sp_module(system):
    from cartslam_tpu.models.sp_planeseg import (
        SuperPixelDisparityPlaneSegmentationModule,
    )

    return [m for m in system.pipeline.modules
            if isinstance(m, SuperPixelDisparityPlaneSegmentationModule)][0]


def test_spatial_checkpoint_resume(mesh, tmp_path):
    """Spatial-mode checkpoint/resume reproduces the uninterrupted run.

    The System loop's checkpointing (device state pytree + module host
    state) must drive the SpatialPipeline unchanged.  A STATIC provider
    keeps `ranges` constant: with a histogram-peak provider, parameter
    updates reach dispatch with the in-flight queue's latency, while a
    checkpoint drains first — so a resumed run legitimately applies a
    refresh one frame earlier than the pipelined uninterrupted run (the
    reference's async provider has the same property,
    planeseg.cu:379-458).  The accumulating histogram itself must still
    survive the round-trip bit-exactly."""
    import json

    from cartslam_tpu.config.registry import read_system_config

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
             "parameter_provider": {
                 "type": "static",
                 "horizontal_range_min": 3, "horizontal_range_max": 40,
                 "vertical_range_min": -6, "vertical_range_max": 3,
             },
             "use_temporal_smoothing": True, "max_warp_y": 8},
        ],
    }

    def cfg_path(tag):
        p = tmp_path / f"spatial-{tag}.json"
        p.write_text(json.dumps(config))
        return str(p)

    full = read_system_config(cfg_path("full"))
    assert full.run() == 5
    ref = full.final_state

    ck = str(tmp_path / "ck.npz")
    first = read_system_config(cfg_path("first"), checkpoint_path=ck,
                               checkpoint_interval=3, max_frames=3)
    assert first.run() == 3
    resumed = read_system_config(cfg_path("resumed"), resume_from=ck)
    assert resumed.run() == 2  # frames 4..5
    got = resumed.final_state

    jax.tree.map(np.testing.assert_array_equal, got, ref)
    # Host state (the accumulating derivative histogram) survives too.
    np.testing.assert_array_equal(
        _sp_module(resumed)._running, _sp_module(full)._running
    )


def test_composed_checkpoint_resume(mesh, tmp_path):
    """Checkpoint/resume through the composed DP x spatial driver
    (SpatialMultiSeqSystem): the stacked per-sequence state and host
    histogram survive a mid-stream resume bit-exactly."""
    import json

    from cartslam_tpu.config.registry import read_system_config

    h, w = 96, 128
    config = {
        "data_source": {
            "type": "synthetic", "image_size": [h, w], "num_frames": 4,
        },
        "parallel": {"mode": "spatial", "devices": 8, "sequences": 2},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1,
             "smoothing_radius": 2, "smoothing_iterations": 1},
            {"type": "disparity_derivative"},
            {"type": "depth"},
            {"type": "optflow", "levels": 3, "search": 2, "refine": 1},
            {"type": "superpixels", "block_size": 8, "iterations": 4,
             "initial_iterations": 6, "reset_iterations": 64},
            {"type": "superpixel_disparity_planeseg",
             "parameter_provider": {
                 "type": "static",
                 "horizontal_range_min": 3, "horizontal_range_max": 40,
                 "vertical_range_min": -6, "vertical_range_max": 3,
             },
             "use_temporal_smoothing": True, "max_warp_y": 8},
        ],
    }

    def cfg_path(tag):
        p = tmp_path / f"composed-{tag}.json"
        p.write_text(json.dumps(config))
        return str(p)

    full = read_system_config(cfg_path("full"))
    assert full.run() == 4 * 2  # frames x sequences
    ref = full.final_state

    ck = str(tmp_path / "ck.npz")
    first = read_system_config(cfg_path("first"), checkpoint_path=ck,
                               checkpoint_interval=2, max_frames=2)
    first.run()
    resumed = read_system_config(cfg_path("resumed"), resume_from=ck)
    assert resumed.run() == 2 * 2  # frames 3..4 on both sequences
    got = resumed.final_state

    # Per-sequence leading axis on every carried leaf.
    labels = got["modules"]["SuperPixelDetect"]["labels"]
    assert labels.shape[0] == 2
    jax.tree.map(np.testing.assert_array_equal, got, ref)
    np.testing.assert_array_equal(
        _sp_module(resumed)._running, _sp_module(full)._running
    )


def test_spatial_fault_recovery_continues(mesh, tmp_path, monkeypatch):
    """An injected device-fetch failure in the spatial mode must
    log-and-continue via snapshot recovery (src/main.cpp:48-54 semantics)
    — the recovery path re-device_puts a host snapshot onto the sharded
    step, exercising resharding of the spatial state."""
    import json

    from cartslam_tpu.config.registry import read_system_config

    h, w = 96, 128
    config = {
        "data_source": {
            "type": "synthetic", "image_size": [h, w], "num_frames": 5,
        },
        "parallel": {"mode": "spatial", "devices": 8},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1},
            {"type": "disparity_derivative"},
            {"type": "depth"},
            {"type": "optflow", "levels": 3, "search": 2, "refine": 1},
            {"type": "superpixels", "block_size": 8, "iterations": 4,
             "initial_iterations": 6, "reset_iterations": 64},
            {"type": "superpixel_disparity_planeseg",
             "parameter_provider": {
                 "type": "static",
                 "horizontal_range_min": 3, "horizontal_range_max": 40,
                 "vertical_range_min": -6, "vertical_range_max": 3,
             },
             "use_temporal_smoothing": True, "max_warp_y": 8},
        ],
    }
    p = tmp_path / "spatial-ft.json"
    p.write_text(json.dumps(config))

    system = read_system_config(str(p), extra_fetch_keys=["planes"])
    orig = system._fetch_with_timeout
    calls = {"n": 0}

    def flaky(outputs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected async device failure")
        return orig(outputs)

    monkeypatch.setattr(system, "_fetch_with_timeout", flaky)
    seen = {}
    n = system.run(on_frame=lambda fid, out: seen.update({fid: out}))
    assert system.failed_frames, "injected failure was not recorded"
    assert n >= 3, n
    assert max(seen) == 5  # the loop reached the end of the sequence
    assert seen[5]["planes"].shape == (h, w)


def test_spatial_grayscale(mesh, tmp_path):
    """The whole-pipeline grayscale switch must work in spatial mode:
    frames arrive single-channel from the source boundary and the
    sharded step runs the 1-channel image feature (previously the step
    assumed BGR and indexed channels of a 2-D array)."""
    import json

    from cartslam_tpu.config.registry import read_system_config

    h, w = 96, 128
    config = {
        "data_source": {
            "type": "synthetic", "image_size": [h, w], "num_frames": 3,
        },
        "grayscale": True,
        "parallel": {"mode": "spatial", "devices": 8},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1},
            {"type": "disparity_derivative"},
            {"type": "depth"},
            {"type": "optflow", "levels": 3, "search": 2, "refine": 1},
            {"type": "superpixels", "block_size": 8, "iterations": 4,
             "initial_iterations": 6, "reset_iterations": 64},
            {"type": "superpixel_disparity_planeseg",
             "parameter_provider": {
                 "type": "static",
                 "horizontal_range_min": 3, "horizontal_range_max": 40,
                 "vertical_range_min": -6, "vertical_range_max": 3,
             },
             "use_temporal_smoothing": True, "max_warp_y": 8},
        ],
    }
    p = tmp_path / "spatial-gray.json"
    p.write_text(json.dumps(config))

    system = read_system_config(str(p), extra_fetch_keys=["planes"])
    seen = {}
    n = system.run(on_frame=lambda fid, out: seen.update({fid: out}))
    assert n == 3
    assert not system.failed_frames
    assert seen[3]["planes"].shape == (h, w)

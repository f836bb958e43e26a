"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartslam_tpu.ops import derivative as dops
from cartslam_tpu.parallel.spatial import sharded_classify, sharded_derivative


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("spatial",))


def test_sharded_derivative_matches_unsharded(mesh):
    rng = np.random.RandomState(0)
    h, w = 32, 128  # 8 shards of width 16
    d = rng.randint(60, 2000, (h, w)).astype(np.int16)
    d[rng.rand(h, w) < 0.1] = -32768

    ref_deriv, ref_hist = dops.directional_derivatives(jnp.array(d))

    f = sharded_derivative(mesh)
    xd = jax.device_put(jnp.array(d), NamedSharding(mesh, P(None, "spatial")))
    out_deriv, out_hist = f(xd)

    np.testing.assert_array_equal(np.array(ref_deriv), np.array(out_deriv))
    np.testing.assert_array_equal(np.array(ref_hist), np.array(out_hist))


def test_sharded_classify(mesh):
    rng = np.random.RandomState(1)
    h, w = 16, 64
    deriv = rng.randint(-100, 100, (h, w)).astype(np.int16)
    ranges = jnp.array([[5, 50], [-10, 5]], jnp.int32)

    from cartslam_tpu.ops import planeseg as pops

    ref = pops.classify(jnp.array(deriv), ranges)
    f = sharded_classify(mesh)
    xd = jax.device_put(jnp.array(deriv), NamedSharding(mesh, P(None, "spatial")))
    out = f(xd, ranges)
    np.testing.assert_array_equal(np.array(ref), np.array(out))


def test_multiseq_batched_step(mesh):
    """Data-parallel multi-sequence throughput mode executes under shard_map."""
    from cartslam_tpu import models
    from cartslam_tpu.parallel.multiseq import make_batched_step
    from cartslam_tpu.runtime.module import PipelineContext
    from cartslam_tpu.runtime.pipeline import Pipeline

    h, w, b = 32, 64, 8
    ctx = PipelineContext(height=h, width=w, q=np.eye(4, dtype=np.float32))
    pipe = Pipeline(
        ctx, [models.ImageDisparityModule((h, w), min_disparity=0, num_disparities=16)]
    )
    step, init_state, init_params = make_batched_step(pipe, b)

    shard = NamedSharding(mesh, P("spatial"))
    state = jax.tree.map(lambda x: jax.device_put(x, shard), init_state())
    rng = np.random.RandomState(0)
    frame = {
        "left": jax.device_put(
            rng.randint(0, 255, (b, h, w, 3), dtype=np.uint8), shard
        ),
        "right": jax.device_put(
            rng.randint(0, 255, (b, h, w, 3), dtype=np.uint8), shard
        ),
        "frame_id": jax.device_put(np.full((b,), 2, np.int32), shard),
    }
    with mesh:
        _, out = jax.jit(step)(state, frame, init_params())
    assert out["disparity"].shape == (b, h, w)


def test_multiseq_system_from_config(mesh, tmp_path):
    """The user-launchable multiseq mode: config -> MultiSeqSystem -> run,
    batch sharded over the 8-device mesh, lock-step sequences."""
    import json

    from cartslam_tpu.config import read_system_config
    from cartslam_tpu.parallel.system import MultiSeqSystem

    cfg = {
        "data_source": {
            "type": "synthetic",
            "image_size": [32, 64],
            "num_frames": 4,
        },
        "parallel": {"mode": "multiseq", "batch": 8},
        "modules": [
            {"type": "disparity", "min_disparity": 0, "num_disparities": 16},
            {"type": "disparity_derivative"},
            {"type": "optflow"},
        ],
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))

    system = read_system_config(str(p))
    assert isinstance(system, MultiSeqSystem)
    assert dict(system.mesh.shape) == {"data": 8}

    seen = {}

    def on_frame(fid, fetched):
        seen[fid] = fetched

    n = system.run(on_frame=on_frame)
    assert n == 4 * 8
    assert sorted(seen) == [1, 2, 3, 4]
    # Carried state is batch-leading (one slot per sequence).
    prev_gray = system.final_state["modules"]["ImageOpticalFlow"]["prev_gray"]
    assert prev_gray.shape == (8, 32, 64)


def test_multiseq_checkpoint_resume(mesh, tmp_path):
    """MultiSeq checkpoint/resume reproduces the uninterrupted run's state."""
    import json

    from cartslam_tpu.config import read_system_config

    def cfg_path(**extra):
        cfg = {
            "data_source": {
                "type": "synthetic", "image_size": [32, 64], "num_frames": 6,
            },
            "parallel": {"mode": "multiseq", "batch": 8},
            "modules": [
                {"type": "disparity", "min_disparity": 0, "num_disparities": 16},
                {"type": "optflow"},
            ],
        }
        p = tmp_path / f"cfg{len(extra)}.json"
        p.write_text(json.dumps(cfg))
        return str(p)

    ck = str(tmp_path / "ck.npz")
    full = read_system_config(cfg_path())
    full.run()
    ref_state = full.final_state

    first = read_system_config(cfg_path(), checkpoint_path=ck,
                               checkpoint_interval=3, max_frames=3)
    first.run()
    second = read_system_config(cfg_path(x=1), resume_from=ck)
    second.run()

    import numpy as np
    np.testing.assert_array_equal(
        second.final_state["modules"]["ImageOpticalFlow"]["prev_gray"],
        ref_state["modules"]["ImageOpticalFlow"]["prev_gray"],
    )


def _multiseq_system(tmp_path, mesh, **extra):
    import json

    from cartslam_tpu.config import read_system_config

    cfg = {
        "data_source": {
            "type": "synthetic", "image_size": [32, 64], "num_frames": 6,
        },
        "parallel": {"mode": "multiseq", "batch": 8},
        "modules": [
            {"type": "disparity", "min_disparity": 0, "num_disparities": 16},
            {"type": "optflow"},  # carried state exercises snapshot recovery
        ],
    }
    p = tmp_path / "ft.json"
    p.write_text(json.dumps(cfg))
    return read_system_config(str(p), extra_fetch_keys=["disparity"], **extra)


def test_multiseq_error_in_one_round_does_not_kill_loop(
    mesh, tmp_path, monkeypatch
):
    """VERDICT r2 item 3: a failed round must log-and-continue with
    snapshot recovery, mirroring the single-sequence System's semantics
    (reference: src/main.cpp:48-54)."""
    system = _multiseq_system(tmp_path, mesh)
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
    assert n >= 3 * 8, n
    assert max(seen) == 6  # the loop reached the end of the sequences


def test_multiseq_fetch_watchdog_times_out(mesh, tmp_path, monkeypatch):
    """A hung multiseq fetch raises DataNotAvailableException after
    data_timeout and the run continues (VERDICT r2: drain had no watchdog)."""
    import time as _time

    system = _multiseq_system(tmp_path, mesh, data_timeout=2.0)
    calls = {"n": 0}

    class Hang:
        def items(self):
            _time.sleep(8.0)
            return []

    orig = system._fetch_with_timeout

    def maybe_hang(outputs):
        calls["n"] += 1
        if calls["n"] == 2:
            return orig(Hang())
        return orig(outputs)

    monkeypatch.setattr(system, "_fetch_with_timeout", maybe_hang)
    n = system.run()
    assert system.failed_frames, "watchdog timeout not recorded"
    assert n >= 3 * 8, n


def test_multiseq_grayscale(mesh, tmp_path):
    """ADVICE r2: grayscale + multiseq used to trace 1-channel modules
    against 3-channel frames."""
    import json

    from cartslam_tpu.config import read_system_config

    cfg = {
        "data_source": {
            "type": "synthetic", "image_size": [32, 64], "num_frames": 3,
        },
        "grayscale": True,
        "parallel": {"mode": "multiseq", "batch": 8},
        "modules": [
            {"type": "disparity", "min_disparity": 0, "num_disparities": 16},
        ],
    }
    p = tmp_path / "gray.json"
    p.write_text(json.dumps(cfg))
    system = read_system_config(str(p), extra_fetch_keys=["disparity"])
    n = system.run()
    assert n == 3 * 8
    assert not system.failed_frames


def test_sharded_interpolate_matches_unsharded(mesh):
    from cartslam_tpu.ops import disparity as dsp
    from cartslam_tpu.parallel.spatial import sharded_interpolate

    rng = np.random.RandomState(2)
    h, w = 24, 128
    d = (rng.randint(4, 60, (h, w)) * 16).astype(np.int16)
    d[rng.rand(h, w) < 0.3] = -32768

    kw = dict(radius=3, iterations=2, min_disparity=16, max_disparity=w)
    ref = dsp.interpolate(jnp.array(d), **kw)
    f = sharded_interpolate(mesh, **kw)
    xd = jax.device_put(jnp.array(d), NamedSharding(mesh, P(None, "spatial")))
    out = f(xd)
    np.testing.assert_array_equal(np.array(ref), np.array(out))


def test_multihost_config_noop_on_single_host():
    """The multihost initializer is config-reachable and a no-op without
    coordinator settings (single-host), so the same config file runs
    everywhere (SURVEY §5.8)."""
    from cartslam_tpu.parallel.distributed import (
        global_data_mesh, initialize_multihost,
    )

    assert initialize_multihost({}) is False
    assert initialize_multihost(None) is False
    mesh = global_data_mesh()
    assert dict(mesh.shape)["data"] == len(jax.devices())

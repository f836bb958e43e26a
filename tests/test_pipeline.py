"""Pipeline composer tests: toposort, dependency verification, history rings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartslam_tpu.runtime.module import Dependency, Module, PipelineContext
from cartslam_tpu.runtime.pipeline import Pipeline, PipelineError


def ctx(h=8, w=8):
    return PipelineContext(height=h, width=w, q=np.eye(4, dtype=np.float32))


class Producer(Module):
    name = "producer"

    def provides(self):
        return ["a"]

    def output_spec(self, c):
        return {"a": jax.ShapeDtypeStruct((c.height, c.width), jnp.float32)}

    def compute(self, c, step, deps, state, params, variant):
        val = jnp.full((c.height, c.width), step.frame_id, jnp.float32)
        return {"a": val}, {}


class Consumer(Module):
    name = "consumer"

    def provides(self):
        return ["b"]

    def requires(self):
        return [Dependency("a"), Dependency("a", offset=-2)]

    def output_spec(self, c):
        return {"b": jax.ShapeDtypeStruct((c.height, c.width), jnp.float32)}

    def compute(self, c, step, deps, state, params, variant):
        prev = step.history("a", -2)
        return {"b": deps["a"] - prev}, {}


def run_frames(pipeline, n):
    state = pipeline.init_state()
    params = pipeline.init_host_params()
    outs = []
    for fid in range(1, n + 1):
        step = pipeline.make_step(pipeline.variant(fid))
        frame = {"frame_id": jnp.int32(fid)}
        state, out = step(state, frame, params)
        outs.append({k: np.array(v) for k, v in out.items()})
    return outs


def test_toposort_reorders():
    p = Pipeline(ctx(), [Consumer(), Producer()])  # wrong order on purpose
    assert [m.name for m in p.modules] == ["producer", "consumer"]


def test_missing_dependency_raises():
    with pytest.raises(PipelineError):
        Pipeline(ctx(), [Consumer()])


def test_duplicate_provider_raises():
    with pytest.raises(PipelineError):
        Pipeline(ctx(), [Producer(), Producer()])


def test_history_ring_semantics():
    p = Pipeline(ctx(), [Producer(), Consumer()])
    outs = run_frames(p, 5)
    # frame t outputs a=t; b = a(t) - a(t-2); ring initialized to zeros.
    assert outs[0]["b"][0, 0] == 1 - 0
    assert outs[1]["b"][0, 0] == 2 - 0
    assert outs[2]["b"][0, 0] == 3 - 1
    assert outs[4]["b"][0, 0] == 5 - 3


def test_cycle_detection():
    class X(Module):
        name = "x"

        def provides(self):
            return ["x"]

        def requires(self):
            return [Dependency("y")]

        def output_spec(self, c):
            return {"x": jax.ShapeDtypeStruct((1,), jnp.float32)}

    class Y(Module):
        name = "y"

        def provides(self):
            return ["y"]

        def requires(self):
            return [Dependency("x")]

        def output_spec(self, c):
            return {"y": jax.ShapeDtypeStruct((1,), jnp.float32)}

    with pytest.raises(PipelineError):
        Pipeline(ctx(), [X(), Y()])


def test_run_retention_window():
    """System keeps the last `run_retention` runs reachable by id
    (System::getRunById / CARTSLAM_RUN_RETENTION parity)."""
    import pytest

    from cartslam_tpu.config import build_system

    system = build_system(
        {"type": "synthetic", "image_size": [32, 64], "num_frames": 6},
        [{"type": "disparity", "num_disparities": 16, "min_disparity": 0}],
        extra_fetch_keys=["disparity"],
        run_retention=4,
    )
    system.run()
    assert system.get_run_by_id(6)["disparity"].shape == (32, 64)
    assert system.get_run_by_id(3)["disparity"].shape == (32, 64)
    with pytest.raises(KeyError):
        system.get_run_by_id(1)  # evicted: outside the retention window

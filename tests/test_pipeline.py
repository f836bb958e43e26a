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

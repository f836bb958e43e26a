"""Pipeline composer: modules -> one jitted step function.

Fixes the reference's missing topological sort (TODO at
src/cartslam.cpp:242) and replaces its future-chaining with static dataflow:
``step(state, frame, params) -> (state, outputs)`` is a pure function that
XLA fuses and schedules.  Startup dependency verification mirrors
src/cartslam.cpp:74-90.
"""

from __future__ import annotations

import functools
from typing import Hashable

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, PipelineContext, StepContext


class PipelineError(RuntimeError):
    pass


def _toposort(modules: list[Module]) -> list[Module]:
    provided_by: dict[str, Module] = {}
    for m in modules:
        for key in m.provides():
            if key in provided_by:
                raise PipelineError(
                    f"key '{key}' provided by both {provided_by[key].name} and {m.name}"
                )
            provided_by[key] = m

    # Verify all same-frame (and historical) requirements are provided.
    for m in modules:
        for dep in m.requires():
            if dep.optional:
                continue
            if dep.key not in provided_by:
                raise PipelineError(
                    f"module {m.name} requires '{dep.key}' which no module provides"
                )

    order: list[Module] = []
    temp: set[int] = set()
    done: set[int] = set()

    def visit(m: Module):
        mid = id(m)
        if mid in done:
            return
        if mid in temp:
            raise PipelineError(f"dependency cycle involving module {m.name}")
        temp.add(mid)
        for dep in m.requires():
            if dep.offset == 0 and dep.key in provided_by:
                visit(provided_by[dep.key])
        temp.discard(mid)
        done.add(mid)
        order.append(m)

    for m in modules:
        visit(m)
    return order


class Pipeline:
    """Composes modules into a single step function with explicit state."""

    def __init__(self, ctx: PipelineContext, modules: list[Module]):
        self.ctx = ctx
        self.modules = _toposort(modules)
        self._specs: dict[str, jax.ShapeDtypeStruct] = {}
        for m in self.modules:
            self._specs.update(m.output_spec(ctx))

        # History requirements: key -> max depth.
        self.history_depth: dict[str, int] = {}
        for m in self.modules:
            for dep in m.requires():
                if dep.offset < 0:
                    d = self.history_depth.get(dep.key, 0)
                    self.history_depth[dep.key] = max(d, -dep.offset)
        for key in self.history_depth:
            if key not in self._specs:
                raise PipelineError(f"history of unknown key '{key}' requested")

    # ------------------------------------------------------------------ state

    def init_state(self) -> dict:
        mod_state = {m.name: m.init_state(self.ctx) for m in self.modules}
        history = {}
        for key, depth in self.history_depth.items():
            spec = self._specs[key]
            history[key] = np.zeros((depth, *spec.shape), spec.dtype)
        return {"modules": mod_state, "history": history}

    def init_host_params(self) -> dict:
        return {m.name: m.initial_host_params(self.ctx) for m in self.modules}

    def host_param_specs(self) -> dict:
        return {m.name: m.host_param_spec(self.ctx) for m in self.modules}

    def host_fetch_keys(self) -> set[str]:
        keys: set[str] = set()
        for m in self.modules:
            keys.update(m.host_fetch_keys())
        return keys

    def variant(self, frame_id: int) -> tuple:
        return tuple(m.variant(frame_id) for m in self.modules)

    # ------------------------------------------------------------------- step

    def make_step(
        self,
        variant: tuple,
        fetch_keys: frozenset[str] | None = None,
        spatial=None,
    ):
        """Build the (unjitted) step function for a given static variant.

        fetch_keys limits returned outputs (history/state still updated for
        all keys); None returns everything.

        spatial: a SpatialContext makes this the row-shard body of the
        spatial latency mode — the SAME module list and composition logic,
        with each module's `compute_spatial` running on its shard of rows
        (parallel/spatial_flagship.py wraps the result in a shard_map).
        One source of truth for the stage math in both modes.
        """

        def step(state, frame, host_params):
            step_ctx = StepContext(frame, state["history"])
            available: dict[str, jax.Array] = {}
            new_mod_state = {}

            for m, var in zip(self.modules, variant):
                deps: dict[str, jax.Array] = {}
                for dep in m.requires():
                    if dep.offset == 0:
                        if dep.key in available:
                            deps[dep.key] = available[dep.key]
                        elif not dep.optional:
                            raise PipelineError(
                                f"{m.name}: '{dep.key}' not computed yet"
                            )
                args = (
                    self.ctx,
                    step_ctx,
                    deps,
                    state["modules"].get(m.name, {}),
                    host_params.get(m.name, {}),
                    var,
                )
                outputs, mstate = (
                    m.compute(*args)
                    if spatial is None
                    else m.compute_spatial(*args, spatial)
                )
                new_mod_state[m.name] = mstate
                available.update(outputs)

            new_history = {}
            for key, depth in self.history_depth.items():
                ring = state["history"][key]
                cur = available[key][None].astype(ring.dtype)
                new_history[key] = jnp.concatenate([cur, ring[:-1]], axis=0)

            if fetch_keys is not None:
                available = {k: v for k, v in available.items() if k in fetch_keys}

            return {"modules": new_mod_state, "history": new_history}, available

        return step

    @functools.lru_cache(maxsize=64)
    def jitted_step(self, variant: tuple, fetch_keys: frozenset[str]):
        step = self.make_step(variant, fetch_keys)
        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------- instrumented step

    @functools.lru_cache(maxsize=None)
    def _module_jit(self, index: int, var: Hashable):
        """Per-module jitted sub-step for instrumented runs."""
        m = self.modules[index]

        def fn(frame, history, deps, mstate, mparams):
            step_ctx = StepContext(frame, history)
            return m.compute(self.ctx, step_ctx, deps, mstate, mparams, var)

        return jax.jit(fn)

    def run_step_instrumented(
        self,
        state,
        frame,
        host_params,
        variant: tuple,
        fetch_keys: frozenset[str] | None = None,
    ):
        """Execute one frame module-by-module with a sync after each module.

        This is the per-module timing mode — the TPU equivalent of the
        reference's per-module CSV rows (src/cartslam.cpp:259-291,
        include/timing.hpp:50-70): ``init`` = module submitted, ``start`` =
        dependencies resolved on device, ``end`` = module outputs ready.
        Slower than the fused `jitted_step` (no cross-module fusion/overlap);
        use it to attribute time, not to measure peak throughput.

        Returns (new_state, outputs, timings) with timings a list of
        (module_name, init_s, start_s, end_s) perf_counter seconds.
        """
        import time as _time

        history = state["history"]
        available: dict[str, jax.Array] = {}
        new_mod_state = {}
        timings: list[tuple[str, float, float, float]] = []

        for i, (m, var) in enumerate(zip(self.modules, variant)):
            deps = {}
            for dep in m.requires():
                if dep.offset == 0 and dep.key in available:
                    deps[dep.key] = available[dep.key]
            fn = self._module_jit(i, var)
            t_init = _time.perf_counter()
            jax.block_until_ready(list(deps.values()))
            t_start = _time.perf_counter()
            outputs, mstate = fn(
                frame,
                history,
                deps,
                state["modules"].get(m.name, {}),
                host_params.get(m.name, {}),
            )
            jax.block_until_ready(outputs)
            t_end = _time.perf_counter()
            timings.append((m.name, t_init, t_start, t_end))
            new_mod_state[m.name] = mstate
            available.update(outputs)

        new_history = {}
        for key in self.history_depth:
            ring = history[key]
            cur = available[key][None].astype(ring.dtype)
            new_history[key] = jnp.concatenate([cur, ring[:-1]], axis=0)

        outputs = (
            {k: v for k, v in available.items() if k in fetch_keys}
            if fetch_keys is not None
            else available
        )
        return {"modules": new_mod_state, "history": new_history}, outputs, timings

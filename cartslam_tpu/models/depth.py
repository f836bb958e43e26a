"""DepthModule (reference: src/modules/depth.cpp:9-25)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import depth as dops
from ..runtime.module import Dependency, Module, PipelineContext

KEY_DISPARITY = "disparity"
KEY_DEPTH = "depth"


class DepthModule(Module):
    name = "Depth"

    def provides(self):
        return [KEY_DEPTH]

    def requires(self):
        return [Dependency(KEY_DISPARITY)]

    def output_spec(self, ctx: PipelineContext):
        return {KEY_DEPTH: jax.ShapeDtypeStruct((ctx.height, ctx.width, 3), jnp.float32)}

    def compute(self, ctx, step, deps, state, params, variant):
        q = jnp.asarray(ctx.q, jnp.float32)
        return {KEY_DEPTH: dops.reproject_to_3d(deps[KEY_DISPARITY], q)}, {}

    def compute_spatial(self, ctx, step, deps, state, params, variant, sp):
        # Pointwise in the disparity; only the y coordinate of the
        # reprojection vector needs the shard's global row offset.
        q = jnp.asarray(ctx.q, jnp.float32)
        depth = dops.reproject_to_3d(
            deps[KEY_DISPARITY], q, row_offset=sp.row0
        )
        return {KEY_DEPTH: depth}, {}

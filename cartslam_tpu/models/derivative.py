"""ImageDisparityDerivativeModule (reference: src/modules/disparity/derivative.cu)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import derivative as dops
from ..runtime.module import Dependency, Module, PipelineContext

KEY_DISPARITY = "disparity"
KEY_DERIVATIVE = "disparity_derivative"
KEY_DERIVATIVE_HISTOGRAM = "disparity_derivative_histogram"


class ImageDisparityDerivativeModule(Module):
    name = "ImageDisparityDerivative"

    def provides(self):
        return [KEY_DERIVATIVE, KEY_DERIVATIVE_HISTOGRAM]

    def requires(self):
        return [Dependency(KEY_DISPARITY)]

    def output_spec(self, ctx: PipelineContext):
        return {
            KEY_DERIVATIVE: jax.ShapeDtypeStruct((ctx.height, ctx.width, 2), jnp.int16),
            KEY_DERIVATIVE_HISTOGRAM: jax.ShapeDtypeStruct((256, 2), jnp.int32),
        }

    def compute(self, ctx, step, deps, state, params, variant):
        deriv, hist = dops.directional_derivatives(deps[KEY_DISPARITY])
        return {KEY_DERIVATIVE: deriv, KEY_DERIVATIVE_HISTOGRAM: hist}, {}

    def spatial_row_dims(self, ctx):
        # The histogram is a global reduction (psum'd), never row-sharded;
        # at ctx.height == 256 shape inference would mistake its bin axis
        # for the row axis.
        return {KEY_DERIVATIVE_HISTOGRAM: None}

    def compute_spatial(self, ctx, step, deps, state, params, variant, sp):
        """2-row edge-duplicated halo (the +-2 stencil's copyToShared
        clamp, derivative.cu:61-76) — exact.  The histogram re-tallies the
        core rows only, then psums: the int16 output encodes the raw
        subtraction exactly wherever it is valid, and both paths drop
        values outside [-128, 127], so the per-bin counts match the
        unsharded op bit-for-bit."""
        d_ext = sp.exchange(deps[KEY_DISPARITY], 2, 2)
        deriv_ext, _ = dops.directional_derivatives(d_ext)
        deriv = deriv_ext[2:-2]
        hist = jnp.stack(
            [
                dops._hist256(
                    deriv[..., 0].astype(jnp.int32), deriv[..., 0] != -32768
                ),
                dops._hist256(
                    deriv[..., 1].astype(jnp.int32), deriv[..., 1] != -32768
                ),
            ],
            axis=-1,
        )
        hist = sp.psum(hist)
        return {KEY_DERIVATIVE: deriv, KEY_DERIVATIVE_HISTOGRAM: hist}, {}

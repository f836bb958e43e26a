"""ImageOpticalFlowModule (reference: src/modules/optflow.cpp:96-132).

Flow is computed between the current and previous reference (left) images.
The previous grayscale frame lives in module state; the reference instead
reaches into the previous run's data element (optflow.cpp:119-127).  The
first frame emits zero flow (the reference emits a null mat; consumers only
read flow when previous frames exist).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import color
from ..ops import optflow as fops
from ..runtime.module import Module, PipelineContext

KEY_OPTFLOW = "optflow"


class ImageOpticalFlowModule(Module):
    name = "ImageOpticalFlow"

    def __init__(
        self,
        image_size,
        levels: int = 4,
        search: int = 4,
        refine: int = 2,
        base_level: int = 1,
        fine_refine: int = 1,
        med_passes: int = 2,
        spatial_mode: str = "global",
        spatial_halo: int = 46,
    ):
        self.image_size = image_size
        self.levels = levels
        self.search = search
        self.refine = refine
        self.base_level = base_level
        self.fine_refine = fine_refine
        self.med_passes = med_passes
        # Height-sharded mode only.  'global' (default): all_gather the
        # ~1 MB gray pair and run ONE global-image pyramid identically on
        # every shard — bit-exact for any shard count (per-shard pyramids
        # shift their decimation grids at non-power-of-two shard offsets).
        # 'sharded': per-shard apron pyramids — ~1/n the flow FLOPs per
        # chip, at the cost of that approximation; spatial_halo must
        # cover the pyramid's total vertical reach (42 px for the default
        # 4-level pyramid after the base_level upsample) plus margin.
        self.spatial_mode = spatial_mode
        self.spatial_halo = spatial_halo

    def provides(self):
        return [KEY_OPTFLOW]

    def output_spec(self, ctx: PipelineContext):
        return {KEY_OPTFLOW: jax.ShapeDtypeStruct((ctx.height, ctx.width, 2), jnp.int16)}

    def init_state(self, ctx: PipelineContext):
        import numpy as np

        return {"prev_gray": np.zeros((ctx.height, ctx.width), np.uint8)}

    def compute(self, ctx, step, deps, state, params, variant):
        left = step.frame["left"]
        gray = left if ctx.grayscale else color.bgr_to_gray(left)
        flow = fops.dense_flow(
            gray,
            state["prev_gray"],
            levels=self.levels,
            search=self.search,
            refine=self.refine,
            base_level=self.base_level,
            fine_refine=self.fine_refine,
            med_passes=self.med_passes,
        )
        out = fops.to_s10_5(flow)
        out = jnp.where(step.frame_id > 1, out, jnp.zeros_like(out))
        return {KEY_OPTFLOW: out}, {"prev_gray": gray}

    def spatial_validate(self, ctx, n, h_local):
        if self.spatial_mode == "sharded" and self.spatial_halo > h_local:
            raise ValueError(
                f"optflow spatial_halo={self.spatial_halo} exceeds the "
                f"{h_local}-row shard"
            )

    def compute_spatial(self, ctx, step, deps, state, params, variant, sp):
        """Sharded flow: prev_gray state lives as row shards; the pyramid
        runs either on the gathered global pair (bit-exact) or on a
        per-shard apron (spatial_mode ctor knob)."""
        left = step.frame["left"]
        gray = left if ctx.grayscale else color.bgr_to_gray(left)
        if self.spatial_mode == "global":
            cur_full = sp.all_gather_rows(gray)
            prev_full = sp.all_gather_rows(state["prev_gray"])
            flow_full = fops.dense_flow(
                cur_full,
                prev_full,
                levels=self.levels,
                search=self.search,
                refine=self.refine,
                base_level=self.base_level,
                fine_refine=self.fine_refine,
                med_passes=self.med_passes,
            )
            out = fops.to_s10_5(sp.slice_rows(flow_full))
        else:
            fh = self.spatial_halo
            cur_ext = sp.exchange(gray, fh, fh)
            prev_ext = sp.exchange(state["prev_gray"], fh, fh)
            flow_ext = fops.dense_flow(
                cur_ext,
                prev_ext,
                levels=self.levels,
                search=self.search,
                refine=self.refine,
                base_level=self.base_level,
                fine_refine=self.fine_refine,
                med_passes=self.med_passes,
            )
            out = fops.to_s10_5(flow_ext[fh:-fh])
        out = jnp.where(step.frame_id > 1, out, jnp.zeros_like(out))
        return {KEY_OPTFLOW: out}, {"prev_gray": gray}

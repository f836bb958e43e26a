"""SuperPixelDisparityPlaneSegmentationModule.

Reference: src/modules/planeseg/sp_planeseg.cu:188-389.  Pixel-level
classification of the VERTICAL-channel derivative (channel 0 of the
derivative module's output), optional temporal flow-warped voting with
current-frame weight 2, then per-superpixel majority aggregation.

Histogram handling follows sp_planeseg.cu:352-388: the running total
accumulates channel 0 of the derivative module's histogram; the very first
contribution is skipped (the reference creates-then-ignores on first use);
parameters refresh at frame ids == 1 (mod update_interval).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import planeseg as pops
from ..runtime.module import Dependency, Module, PipelineContext
from ..utils.plane_params import PlaneParameterProvider

KEY_SUPERPIXELS = "superpixels"
KEY_MAX_LABEL = "superpixels_max_label"
KEY_DERIVATIVE = "disparity_derivative"
KEY_DERIVATIVE_HISTOGRAM = "disparity_derivative_histogram"
KEY_OPTFLOW = "optflow"
KEY_PLANES = "planes"
KEY_PLANES_UNSMOOTHED = "planes_unsmoothed"
KEY_PLANE_PARAMETERS = "plane_parameters"
KEY_GLOBAL_HIST = "disp_derivative_histogram"


class SuperPixelDisparityPlaneSegmentationModule(Module):
    name = "SPPlaneSegmentation"

    def __init__(
        self,
        provider: PlaneParameterProvider,
        num_labels: int,
        update_interval: int = 30,
        reset_interval: int = 10,
        use_temporal_smoothing: bool = False,
        temporal_smoothing_distance: int = 3,
        temporal_mode: str = "carried",
        warp_mode: str = "auto",
        max_warp_y: int = 32,
        max_warp_x: int = 64,
    ):
        self.provider = provider
        self.num_labels = num_labels
        self.update_interval = update_interval
        self.reset_interval = reset_interval
        self.temporal = use_temporal_smoothing
        self.distance = temporal_smoothing_distance
        # 'carried': one warp/frame via the carried accumulator (TPU-first);
        # 'faithful': the reference's K original-pixel warp gathers
        # (sp_planeseg.cu:80-121) — config-reachable for A/B comparison.
        self.temporal_mode = temporal_mode
        self.warp_mode = warp_mode
        self.max_warp_y = max_warp_y
        self.max_warp_x = max_warp_x
        self._running: np.ndarray | None = None

    def provides(self):
        keys = [KEY_PLANES]
        if self.temporal:
            keys.append(KEY_PLANES_UNSMOOTHED)
        return keys

    def requires(self):
        deps = [
            Dependency(KEY_SUPERPIXELS),
            Dependency(KEY_MAX_LABEL),
            Dependency(KEY_DERIVATIVE),
            Dependency(KEY_DERIVATIVE_HISTOGRAM),
        ]
        if self.temporal:
            deps.append(Dependency(KEY_OPTFLOW))
            if self.temporal_mode == "faithful":
                for i in range(1, self.distance):
                    deps.append(Dependency(KEY_OPTFLOW, offset=-i))
                for i in range(1, self.distance + 1):
                    deps.append(Dependency(KEY_PLANES_UNSMOOTHED, offset=-i))
            else:
                # Carried warp accumulator (ops/planeseg.py:
                # temporal_vote_warped) replaces the deep history reads.
                deps.append(Dependency(KEY_PLANES_UNSMOOTHED, offset=-1))
        return deps

    def init_state(self, ctx: PipelineContext):
        if not self.temporal or self.temporal_mode == "faithful":
            return {}
        from ..ops import planeseg as _p

        return {
            "warp_votes": np.full(
                (self.distance, ctx.height, ctx.width), _p.WARP_INVALID, np.uint8
            )
        }

    def output_spec(self, ctx: PipelineContext):
        spec = {KEY_PLANES: jax.ShapeDtypeStruct((ctx.height, ctx.width), jnp.uint8)}
        if self.temporal:
            spec[KEY_PLANES_UNSMOOTHED] = jax.ShapeDtypeStruct(
                (ctx.height, ctx.width), jnp.uint8
            )
        return spec

    def host_param_spec(self, ctx: PipelineContext):
        return {"ranges": jax.ShapeDtypeStruct((2, 2), jnp.int32)}

    def initial_host_params(self, ctx: PipelineContext):
        return {"ranges": self.provider.get().ranges_array()}

    def host_fetch_keys(self):
        return [KEY_DERIVATIVE_HISTOGRAM]

    def host_fetch_reduce(self):
        return {KEY_DERIVATIVE_HISTOGRAM: "sum"}  # additive histogram

    def host_state(self):
        p = self.provider.get()
        return {
            "running_hist": (
                self._running.copy() if self._running is not None else np.zeros(0)
            ),
            "h_range": np.array(p.horizontal_range),
            "v_range": np.array(p.vertical_range),
        }

    def restore_host_state(self, state):
        from ..utils.plane_params import PlaneParameters

        rh = np.asarray(state["running_hist"])
        self._running = rh.astype(np.int64) if rh.size else None
        h = tuple(int(v) for v in state["h_range"])
        v = tuple(int(v) for v in state["v_range"])
        self.provider.params = PlaneParameters(
            horizontal_range=h,
            vertical_range=v,
            horizontal_center=(h[0] + h[1]) // 2,
            vertical_center=(v[0] + v[1]) // 2,
        )

    def host_update(self, ctx, frame_id, fetched, system=None):
        hist = fetched[KEY_DERIVATIVE_HISTOGRAM][:, 0].astype(np.int64)  # vertical ch
        if self._running is None:
            # sp_planeseg.cu:364-366: first contribution is dropped.
            self._running = np.zeros_like(hist)
            snapshot = hist
        else:
            self._running += hist
            snapshot = self._running.copy()
        if system is not None:
            # Per-frame accumulating histogram for the live vis window
            # (planeseg_vis.cu:111-211 plots it every frame).
            system.insert_global_data(KEY_GLOBAL_HIST + "_live", snapshot)
        if frame_id % (self.update_interval * self.reset_interval) == 1:
            self._running[:] = 0
        if frame_id % self.update_interval != 1:
            return None
        self.provider.update(snapshot)
        params = self.provider.get()
        if system is not None:
            system.insert_global_data(KEY_PLANE_PARAMETERS, params)
            system.insert_global_data(KEY_GLOBAL_HIST, snapshot)
        return {"ranges": params.ranges_array()}

    def compute(self, ctx, step, deps, state, params, variant):
        vert = deps[KEY_DERIVATIVE][..., 0]
        pixel_planes = pops.classify(vert, params["ranges"])

        new_state = {}
        if self.temporal and self.temporal_mode == "faithful":
            flows = [deps[KEY_OPTFLOW]] + [
                step.history(KEY_OPTFLOW, -i) for i in range(1, self.distance)
            ]
            prevs = [
                step.history(KEY_PLANES_UNSMOOTHED, -i)
                for i in range(1, self.distance + 1)
            ]
            num_prev = jnp.minimum(step.frame_id - 1, self.distance)
            voted = pops.temporal_vote(
                pixel_planes, jnp.stack(prevs), jnp.stack(flows), num_prev,
                current_weight=2, compare_unknown=True,
            )
        elif self.temporal:
            prev = step.history(KEY_PLANES_UNSMOOTHED, -1)
            prev = jnp.where(
                step.frame_id > 1, prev, np.uint8(pops.WARP_INVALID)
            )
            voted, warp_votes = pops.temporal_vote_warped(
                pixel_planes, prev, state["warp_votes"], deps[KEY_OPTFLOW],
                current_weight=2, compare_unknown=True,
                warp_mode=self.warp_mode, max_warp_y=self.max_warp_y,
                max_warp_x=self.max_warp_x,
            )
            new_state["warp_votes"] = warp_votes
        else:
            voted = pixel_planes

        smoothed = pops.superpixel_vote(
            voted, deps[KEY_SUPERPIXELS], self.num_labels
        )

        outputs = {KEY_PLANES: smoothed}
        if self.temporal:
            # sp_planeseg.cu:77: the unsmoothed output is the raw per-pixel
            # classification; the temporal vote only feeds the label tally.
            outputs[KEY_PLANES_UNSMOOTHED] = pixel_planes
        return outputs, new_state

    # ------------------------------------------------------ spatial (sharded)

    def spatial_row_dims(self, ctx):
        # warp_votes stacks the temporal distance ahead of the row axis.
        return {"warp_votes": 1}

    def spatial_validate(self, ctx, n, h_local):
        if self.temporal and self.temporal_mode == "faithful":
            raise ValueError(
                "spatial mode supports temporal_mode='carried' only (the "
                "faithful K-gather mode would need K flow-history halos)"
            )
        if self.temporal and self.max_warp_y > h_local:
            import logging

            logging.getLogger("cart.spatial").warning(
                "spatial mode clamps max_warp_y %d -> %d (the halo cannot "
                "exceed one %d-row shard)",
                self.max_warp_y, h_local, h_local,
            )

    def compute_spatial(self, ctx, step, deps, state, params, variant, sp):
        """Sharded vote chain: `max_warp_y`-row halos of the packed vote
        stack with WARP_INVALID fill at global borders — exact for
        bounded warps ('select' mode is REQUIRED: its displacement bound
        equals the exchanged halo depth, so every in-bound source row is
        locally present and the result is identical for any shard
        count).  The per-label tally counts core rows once, psum'd
        (sp_planeseg.cu:119-184)."""
        vert = deps[KEY_DERIVATIVE][..., 0]
        pixel_planes = pops.classify(vert, params["ranges"])

        new_state = {}
        if self.temporal:
            ry = min(self.max_warp_y, sp.h_local)
            prev = step.history(KEY_PLANES_UNSMOOTHED, -1)
            prev = jnp.where(
                step.frame_id > 1, prev, np.uint8(pops.WARP_INVALID)
            )
            prev_ext = sp.exchange(prev, ry, ry, fill=pops.WARP_INVALID)
            votes_ext = sp.exchange(
                state["warp_votes"].transpose(1, 0, 2), ry, ry,
                fill=pops.WARP_INVALID,
            ).transpose(1, 0, 2)
            flow_ext = sp.exchange(deps[KEY_OPTFLOW], ry, ry, fill=0)
            cur_ext = sp.exchange(pixel_planes, ry, ry, fill=pops.UNKNOWN)
            voted_ext, warp_ext = pops.temporal_vote_warped(
                cur_ext, prev_ext, votes_ext, flow_ext,
                current_weight=2, compare_unknown=True, warp_mode="select",
                max_warp_y=ry, max_warp_x=self.max_warp_x,
            )
            voted = voted_ext[ry:-ry]
            new_state["warp_votes"] = warp_ext[:, ry:-ry]
        else:
            voted = pixel_planes

        smoothed = pops.superpixel_vote(
            voted, deps[KEY_SUPERPIXELS], self.num_labels, axis_name=sp.axis
        )

        outputs = {KEY_PLANES: smoothed}
        if self.temporal:
            outputs[KEY_PLANES_UNSMOOTHED] = pixel_planes
        return outputs, new_state

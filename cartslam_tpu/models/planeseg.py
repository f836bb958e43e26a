"""DisparityPlaneSegmentationModule (pixel-level).

Reference: src/modules/planeseg/planeseg.cu:246-403 and
include/modules/planeseg.hpp:115-162.  Device path: private low-pass
derivative + 256-bin histogram, range classification, optional temporal
smoothing by flow-warped majority voting over the previous
`temporal_smoothing_distance` frames' unsmoothed planes.

Host path: the per-frame histogram is accumulated into a running total; at
frame ids == 1 (mod update_interval) the parameter provider re-derives the
classification ranges, which flow back in as a tiny host param.  Under
pipelined dispatch the refreshed ranges take effect a few frames late —
the reference has the same looseness with 12 concurrent runs mutating a
shared provider (planeseg.cu:269-288).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import derivative as dops
from ..ops import planeseg as pops
from ..runtime.module import Dependency, Module, PipelineContext
from ..utils.plane_params import PlaneParameterProvider

KEY_DISPARITY = "disparity"
KEY_OPTFLOW = "optflow"
KEY_PLANES = "planes"
KEY_PLANES_UNSMOOTHED = "planes_unsmoothed"
KEY_PLANE_PARAMETERS = "plane_parameters"
KEY_GLOBAL_HIST = "disp_derivative_histogram"
KEY_FRAME_HIST = "planeseg_frame_histogram"


class DisparityPlaneSegmentationModule(Module):
    name = "PlaneSegmentation"

    def __init__(
        self,
        provider: PlaneParameterProvider,
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
        self.update_interval = update_interval
        self.reset_interval = reset_interval
        self.temporal = use_temporal_smoothing
        self.distance = temporal_smoothing_distance
        # 'carried': one warp/frame via the carried accumulator (TPU-first);
        # 'faithful': the reference's K separate original-pixel warp gathers
        # (planeseg.cu:210-227) — config-reachable for A/B comparison.
        self.temporal_mode = temporal_mode
        self.warp_mode = warp_mode
        self.max_warp_y = max_warp_y
        self.max_warp_x = max_warp_x
        self._running = np.zeros(256, np.int64)

    def provides(self):
        keys = [KEY_PLANES, KEY_FRAME_HIST]
        if self.temporal:
            keys.append(KEY_PLANES_UNSMOOTHED)
        return keys

    def requires(self):
        deps = [Dependency(KEY_DISPARITY)]
        if self.temporal:
            deps.append(Dependency(KEY_OPTFLOW))
            if self.temporal_mode == "faithful":
                # The reference's dependency set: unsmoothed planes @-1..-K
                # and flow @-1..-(K-1) (include/modules/planeseg.hpp:127-137).
                for i in range(1, self.distance):
                    deps.append(Dependency(KEY_OPTFLOW, offset=-i))
                for i in range(1, self.distance + 1):
                    deps.append(Dependency(KEY_PLANES_UNSMOOTHED, offset=-i))
            else:
                # The carried warp accumulator (ops/planeseg.py:
                # temporal_vote_warped) replaces the deep history reads —
                # only the immediately previous unsmoothed planes and the
                # current flow are consumed each frame.
                deps.append(Dependency(KEY_PLANES_UNSMOOTHED, offset=-1))
        return deps

    def init_state(self, ctx: PipelineContext):
        if not self.temporal or self.temporal_mode == "faithful":
            return {}
        return {
            "warp_votes": np.full(
                (self.distance, ctx.height, ctx.width),
                pops.WARP_INVALID,
                np.uint8,
            )
        }

    def output_spec(self, ctx: PipelineContext):
        spec = {
            KEY_PLANES: jax.ShapeDtypeStruct((ctx.height, ctx.width), jnp.uint8),
            KEY_FRAME_HIST: jax.ShapeDtypeStruct((256,), jnp.int32),
        }
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
        return [KEY_FRAME_HIST]

    def host_fetch_reduce(self):
        return {KEY_FRAME_HIST: "sum"}  # additive histogram

    def host_state(self):
        p = self.provider.get()
        return {
            "running_hist": self._running.copy(),
            "h_range": np.array(p.horizontal_range),
            "v_range": np.array(p.vertical_range),
        }

    def restore_host_state(self, state):
        from ..utils.plane_params import PlaneParameters

        self._running = np.asarray(state["running_hist"]).astype(np.int64)
        h = tuple(int(v) for v in state["h_range"])
        v = tuple(int(v) for v in state["v_range"])
        self.provider.params = PlaneParameters(
            horizontal_range=h,
            vertical_range=v,
            horizontal_center=(h[0] + h[1]) // 2,
            vertical_center=(v[0] + v[1]) // 2,
        )

    def host_update(self, ctx, frame_id, fetched, system=None):
        self._running += fetched[KEY_FRAME_HIST].astype(np.int64)
        if system is not None:
            # The reference's planeseg vis plots the ACCUMULATING running
            # histogram every frame (planeseg_vis.cu:111-211), not just the
            # update_interval snapshots.
            system.insert_global_data(
                KEY_GLOBAL_HIST + "_live", self._running.copy()
            )
        if frame_id % self.update_interval != 1:
            return None
        snapshot = self._running.copy()
        if frame_id % (self.update_interval * self.reset_interval) == 1:
            self._running[:] = 0
        self.provider.update(snapshot)
        params = self.provider.get()
        if system is not None:
            system.insert_global_data(KEY_PLANE_PARAMETERS, params)
            system.insert_global_data(KEY_GLOBAL_HIST, snapshot)
        return {"ranges": params.ranges_array()}

    def compute(self, ctx, step, deps, state, params, variant):
        deriv, hist = dops.planeseg_derivative(deps[KEY_DISPARITY])
        planes = pops.classify(deriv, params["ranges"])
        outputs = {KEY_FRAME_HIST: hist}

        if not self.temporal:
            outputs[KEY_PLANES] = planes
            return outputs, {}

        if self.temporal_mode == "faithful":
            flows = [deps[KEY_OPTFLOW]] + [
                step.history(KEY_OPTFLOW, -i) for i in range(1, self.distance)
            ]
            prevs = [
                step.history(KEY_PLANES_UNSMOOTHED, -i)
                for i in range(1, self.distance + 1)
            ]
            num_prev = jnp.minimum(step.frame_id - 1, self.distance)
            smoothed = pops.temporal_vote(
                planes, jnp.stack(prevs), jnp.stack(flows), num_prev,
                current_weight=1, compare_unknown=False,
            )
            outputs[KEY_PLANES] = smoothed
            outputs[KEY_PLANES_UNSMOOTHED] = planes
            return outputs, {}

        prev = step.history(KEY_PLANES_UNSMOOTHED, -1)
        prev = jnp.where(step.frame_id > 1, prev, np.uint8(pops.WARP_INVALID))
        smoothed, warp_votes = pops.temporal_vote_warped(
            planes, prev, state["warp_votes"], deps[KEY_OPTFLOW],
            current_weight=1, compare_unknown=False,
            warp_mode=self.warp_mode, max_warp_y=self.max_warp_y,
            max_warp_x=self.max_warp_x,
        )
        outputs[KEY_PLANES] = smoothed
        outputs[KEY_PLANES_UNSMOOTHED] = planes
        return outputs, {"warp_votes": warp_votes}

    # ------------------------------------------------------ spatial (sharded)

    def spatial_row_dims(self, ctx):
        return {KEY_FRAME_HIST: None, "warp_votes": 1}

    def spatial_validate(self, ctx, n, h_local):
        if self.temporal and self.temporal_mode == "faithful":
            raise ValueError(
                "spatial mode supports temporal_mode='carried' only"
            )

    def compute_spatial(self, ctx, step, deps, state, params, variant, sp):
        """Sharded pixel planeseg: the private low-pass derivative's
        vertical reach is 3 rows (5-tap mean then +-1 diff,
        planeseg.cu:31-142) — edge-duplicated halo, exact; the core-row
        histogram re-tally is psum'd (same bit-equality argument as
        ImageDisparityDerivativeModule.compute_spatial)."""
        d_ext = sp.exchange(deps[KEY_DISPARITY], 3, 3)
        deriv_ext, _ = dops.planeseg_derivative(d_ext)
        deriv = deriv_ext[3:-3]
        hist = sp.psum(
            dops._hist256(deriv.astype(jnp.int32), deriv != -32768)
        )
        planes = pops.classify(deriv, params["ranges"])
        outputs = {KEY_FRAME_HIST: hist}

        if not self.temporal:
            outputs[KEY_PLANES] = planes
            return outputs, {}

        ry = min(self.max_warp_y, sp.h_local)
        prev = step.history(KEY_PLANES_UNSMOOTHED, -1)
        prev = jnp.where(step.frame_id > 1, prev, np.uint8(pops.WARP_INVALID))
        prev_ext = sp.exchange(prev, ry, ry, fill=pops.WARP_INVALID)
        votes_ext = sp.exchange(
            state["warp_votes"].transpose(1, 0, 2), ry, ry,
            fill=pops.WARP_INVALID,
        ).transpose(1, 0, 2)
        flow_ext = sp.exchange(deps[KEY_OPTFLOW], ry, ry, fill=0)
        cur_ext = sp.exchange(planes, ry, ry, fill=pops.UNKNOWN)
        smoothed_ext, warp_ext = pops.temporal_vote_warped(
            cur_ext, prev_ext, votes_ext, flow_ext,
            current_weight=1, compare_unknown=False, warp_mode="select",
            max_warp_y=ry, max_warp_x=self.max_warp_x,
        )
        outputs[KEY_PLANES] = smoothed_ext[ry:-ry]
        outputs[KEY_PLANES_UNSMOOTHED] = planes
        return outputs, {"warp_votes": warp_ext[:, ry:-ry]}

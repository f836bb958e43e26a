"""Height-sharded flagship step: single-frame latency scaling over a mesh.

MultiSeqSystem (parallel/system.py) scales THROUGHPUT by sharding
independent sequences; one frame is still chip-local.  This module shards
a SINGLE frame's rows across a 1-D ``spatial`` mesh axis so the flagship
chain itself (SGM -> interpolate -> derivative -> depth -> flow ->
contour relaxation -> temporal vote -> superpixel plane segmentation)
runs cooperatively on all chips — the scale-out analogue of the
reference's tiled shared-memory kernels (include/utils/cuda.cuh:59-191),
with `ppermute` row halos standing in for the tile aprons and `psum` for
the global reductions (label statistics, vote tallies, histograms).

Seam handling per stage:
  * SGM: horizontal sweeps are row-local (exact); vertical sweeps warm up
    through a `sgm_halo`-row apron (path influence decays geometrically
    with P1/P2, so a few dozen rows make seams numerically invisible).
  * interpolate / derivative: 1- and 2-row edge-duplicated halos — exact
    (edge duplication IS the ops' clamp convention).
  * optical flow: an apron covering the pyramid's total vertical reach.
  * contour relaxation: `iterations`-row halos (label influence moves one
    row per sweep) + psum'd label moments — exact in 'frame' stats mode;
    OOB fills (-1) reproduce image-edge masking at the global borders.
  * temporal vote: `max_warp_y`-row halos of the packed vote stack,
    WARP_INVALID fill at global borders — exact for bounded warps.
  * per-label reductions (stats, votes) count core rows once, psum'd.

Halos must fit in one neighbor shard: halo <= H / n_devices.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import color, depth as depth_ops, derivative as dops
from ..ops import disparity as dsp, optflow, planeseg as pops, stereo
from ..ops import superpixels as spops
from ..ops.tally import label_tally, table_gather


def exchange_row_halo(x, up: int, down: int, axis_name: str, fill="edge"):
    """Extend a row shard [H_local, ...] with neighbor rows over the mesh.

    fill: 'edge' duplicates the border row at the global image edges (the
    stencil ops' clamp convention); a scalar fills them with a constant.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    parts = []
    if up:
        from_above = jax.lax.ppermute(
            x[-up:], axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        if fill == "edge":
            edge = jnp.repeat(x[:1], up, axis=0)
        else:
            edge = jnp.full((up, *x.shape[1:]), fill, x.dtype)
        parts.append(jnp.where(idx == 0, edge, from_above))
    parts.append(x)
    if down:
        from_below = jax.lax.ppermute(
            x[:down], axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        if fill == "edge":
            edge = jnp.repeat(x[-1:], down, axis=0)
        else:
            edge = jnp.full((down, *x.shape[1:]), fill, x.dtype)
        parts.append(jnp.where(idx == n - 1, edge, from_below))
    return jnp.concatenate(parts, axis=0)


class SpatialFlagshipConfig(NamedTuple):
    height: int
    width: int
    num_disparities: int = 256
    min_disparity: int = 4
    sgm_p1: int = 10
    sgm_p2: int = 120
    uniqueness: int = 12
    smoothing_radius: int = 2
    smoothing_iterations: int = 1
    block_size: int = 12
    iterations: int = 8
    image_weight: float = 1.5
    disparity_weight: float = 1.0
    compactness_weight: float = 0.1
    direct_clique_cost: float = 0.5
    diagonal_clique_cost: float = 0.5 / np.sqrt(2.0)
    temporal_distance: int = 3
    max_warp_y: int = 16
    max_warp_x: int = 64
    sgm_halo: int = 24
    flow_halo: int = 40
    axis: str = "spatial"


class SpatialFlagship:
    """Builds the height-sharded flagship step for a given mesh."""

    def __init__(self, mesh: Mesh, config: SpatialFlagshipConfig):
        self.mesh = mesh
        self.cfg = config
        self.n = mesh.shape[config.axis]
        if config.height % self.n:
            raise ValueError("height must divide the spatial axis size")
        self.h_local = config.height // self.n
        for halo, name in (
            (config.sgm_halo, "sgm_halo"),
            (config.flow_halo, "flow_halo"),
            (config.iterations, "iterations"),
            (config.max_warp_y, "max_warp_y"),
        ):
            if halo > self.h_local:
                raise ValueError(
                    f"{name}={halo} exceeds the {self.h_local}-row shard"
                )
        bx = -(-config.width // config.block_size)
        by = -(-config.height // config.block_size)
        self.num_labels = bx * by + 1
        self.shard = NamedSharding(mesh, P(config.axis))
        self.repl = NamedSharding(mesh, P())

    # ---------------------------------------------------------------- state

    def init_state(self):
        c = self.cfg
        labels, _ = spops.block_init_labels(
            c.height, c.width, c.block_size, c.block_size
        )
        return {
            "labels": np.asarray(labels),
            "prev_gray": np.zeros((c.height, c.width), np.uint8),
            "warp_votes": np.full(
                (c.temporal_distance, c.height, c.width),
                pops.WARP_INVALID, np.uint8,
            ),
            "prev_unsmoothed": np.full(
                (c.height, c.width), pops.WARP_INVALID, np.uint8
            ),
        }

    def init_params(self, ranges=((3, 40), (-6, 3))):
        return {"ranges": np.asarray(ranges, np.int32)}

    # ----------------------------------------------------------------- step

    def _local_step(self, state, frame, params):
        c = self.cfg
        ax = c.axis
        idx = jax.lax.axis_index(ax)
        row0 = idx * self.h_local  # global row of the shard's first row

        left, right = frame["left"], frame["right"]
        frame_id = frame["frame_id"]
        gray_l = color.bgr_to_gray(left)
        gray_r = color.bgr_to_gray(right)

        # --- SGM + interpolation (sgm_halo apron; vertical-sweep warmup) --
        hs = c.sgm_halo
        gl_ext = exchange_row_halo(gray_l, hs, hs, ax)
        gr_ext = exchange_row_halo(gray_r, hs, hs, ax)
        disp_ext = stereo.sgm_disparity(
            gl_ext, gr_ext,
            min_disparity=c.min_disparity,
            num_disparities=c.num_disparities,
            p1=c.sgm_p1, p2=c.sgm_p2, uniqueness=c.uniqueness,
        )
        if c.smoothing_radius > 0:
            disp_ext = dsp.interpolate(
                disp_ext,
                radius=c.smoothing_radius,
                iterations=c.smoothing_iterations,
                min_disparity=c.min_disparity * 16,
                max_disparity=c.width * 16,
            )
        disparity = disp_ext[hs:-hs]

        # --- derivative + histogram (2-row edge-dup halo; exact) ---------
        d_ext = exchange_row_halo(disparity, 2, 2, ax)
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
        hist = jax.lax.psum(hist, ax)

        # --- depth (pointwise, global rows) ------------------------------
        depth = depth_ops.reproject_to_3d(
            disparity, jnp.asarray(np.eye(4, dtype=np.float32)), row_offset=row0
        )

        # --- optical flow (apron covers the pyramid's vertical reach) ----
        fh = c.flow_halo
        cur_ext = exchange_row_halo(gray_l, fh, fh, ax)
        prev_ext = exchange_row_halo(state["prev_gray"], fh, fh, ax)
        flow_ext = optflow.dense_flow(cur_ext, prev_ext)
        flow = optflow.to_s10_5(flow_ext[fh:-fh])
        flow = jnp.where(frame_id > 1, flow, jnp.zeros_like(flow))

        # --- contour relaxation (iterations-row halo, psum'd stats) ------
        it = c.iterations
        ycrcb = color.bgr_to_ycrcb(left).astype(jnp.float32)
        lab_ext = exchange_row_halo(state["labels"], it, it, ax, fill=-1)
        deriv_f = deriv.astype(jnp.float32)
        deriv_ext_f = exchange_row_halo(deriv_f, it, it, ax)
        ycrcb_ext = exchange_row_halo(ycrcb, it, it, ax)
        specs = [
            spops.FeatureSpec("gaussian", c.disparity_weight, 2),
            spops.FeatureSpec("gaussian", c.image_weight, 3),
            spops.FeatureSpec("compactness", c.compactness_weight, 2),
        ]
        labels_ext = spops.relax(
            lab_ext,
            [deriv_ext_f, ycrcb_ext],
            specs,
            self.num_labels,
            it,
            c.direct_clique_cost,
            c.diagonal_clique_cost,
            stats_refresh="frame",
            axis_name=ax,
            row_offset=row0 - it,
            global_h=c.height,
            halo_rows=(it, it),
        )
        labels = labels_ext[it:-it]

        # --- pixel classification + temporal vote ------------------------
        pixel_planes = pops.classify(deriv[..., 0], params["ranges"])
        ry = c.max_warp_y
        prev_un = jnp.where(
            frame_id > 1, state["prev_unsmoothed"],
            jnp.uint8(pops.WARP_INVALID),
        )
        prev_ext2 = exchange_row_halo(
            prev_un, ry, ry, ax, fill=pops.WARP_INVALID
        )
        votes_ext = exchange_row_halo(
            state["warp_votes"].transpose(1, 0, 2), ry, ry, ax,
            fill=pops.WARP_INVALID,
        ).transpose(1, 0, 2)
        flow_ext2 = exchange_row_halo(flow, ry, ry, ax, fill=0)
        cur_ext2 = exchange_row_halo(
            pixel_planes, ry, ry, ax, fill=pops.UNKNOWN
        )
        # 'select' mode is REQUIRED here: its displacement bound equals the
        # exchanged halo depth, so every in-bound source row is locally
        # present and the result is identical for any shard count.
        voted_ext, warp_ext = pops.temporal_vote_warped(
            cur_ext2, prev_ext2, votes_ext, flow_ext2,
            current_weight=2, compare_unknown=True, warp_mode="select",
            max_warp_y=ry, max_warp_x=c.max_warp_x,
        )
        voted = voted_ext[ry:-ry]
        warp_votes = warp_ext[:, ry:-ry]

        # --- superpixel vote (core tally, psum, replicated winner) -------
        oh_votes = (
            voted.reshape(-1)[:, None]
            == jnp.arange(pops.PLANE_COUNT, dtype=jnp.uint8)
        ).astype(jnp.bfloat16)
        counts = jax.lax.psum(
            label_tally(labels.reshape(-1), oh_votes, self.num_labels), ax
        ).astype(jnp.int32)
        best = jnp.full((self.num_labels,), pops.UNKNOWN, jnp.int32)
        best_votes = counts[:, pops.UNKNOWN]
        take_v = counts[:, pops.VERTICAL] > best_votes
        best = jnp.where(take_v, pops.VERTICAL, best)
        best_votes = jnp.where(take_v, counts[:, pops.VERTICAL], best_votes)
        take_h = counts[:, pops.HORIZONTAL] > best_votes
        best = jnp.where(take_h, pops.HORIZONTAL, best)
        planes = table_gather(best, labels).astype(jnp.uint8)

        new_state = {
            "labels": labels,
            "prev_gray": gray_l,
            "warp_votes": warp_votes,
            "prev_unsmoothed": pixel_planes,
        }
        outputs = {
            "disparity": disparity,
            "disparity_derivative": deriv,
            "disparity_derivative_histogram": hist,
            "depth": depth,
            "optflow": flow,
            "superpixels": labels,
            "planes": planes,
            "planes_unsmoothed": pixel_planes,
        }
        return new_state, outputs

    def make_step(self):
        c = self.cfg
        specs_state = {
            "labels": P(c.axis), "prev_gray": P(c.axis),
            "warp_votes": P(None, c.axis), "prev_unsmoothed": P(c.axis),
        }
        specs_frame = {
            "left": P(c.axis), "right": P(c.axis), "frame_id": P(),
        }
        out_specs = (
            specs_state,
            {
                "disparity": P(c.axis), "disparity_derivative": P(c.axis),
                "disparity_derivative_histogram": P(), "depth": P(c.axis),
                "optflow": P(c.axis), "superpixels": P(c.axis),
                "planes": P(c.axis), "planes_unsmoothed": P(c.axis),
            },
        )
        fn = jax.shard_map(
            self._local_step,
            mesh=self.mesh,
            in_specs=(specs_state, specs_frame, {"ranges": P()}),
            out_specs=out_specs,
            # The ops use unvarying scan inits (SGM path carries, tallies);
            # the varying-manual-axes checker rejects those inside manual
            # regions even though the program is correct.
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,))

"""Plane segmentation from disparity derivatives.

Pixel-level classification and temporal (optical-flow-warped) vote smoothing
(src/modules/planeseg/planeseg.cu:160-243), plus the superpixel-aggregated
variant (src/modules/planeseg/sp_planeseg.cu:25-184).

Plane ids: HORIZONTAL=0, VERTICAL=1, UNKNOWN=2
(include/modules/planeseg.hpp:37-41).  Classification checks the horizontal
range first, then the vertical range, both half-open [start, end).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DERIVATIVE_INVALID = -32768

HORIZONTAL = 0
VERTICAL = 1
UNKNOWN = 2
PLANE_COUNT = 3


def classify(derivative: jnp.ndarray, ranges: jnp.ndarray) -> jnp.ndarray:
    """Threshold derivative [H,W] int -> plane labels uint8 [H,W].

    `ranges` is int32 [2, 2]: [[h_start, h_end], [v_start, v_end]]
    (planeseg.cu:176-197: horizontal tested first, then vertical).
    """
    d = derivative.astype(jnp.int32)
    valid = d != DERIVATIVE_INVALID
    is_h = valid & (d >= ranges[0, 0]) & (d < ranges[0, 1])
    is_v = valid & (d >= ranges[1, 0]) & (d < ranges[1, 1]) & ~is_h
    return jnp.where(is_h, HORIZONTAL, jnp.where(is_v, VERTICAL, UNKNOWN)).astype(
        jnp.uint8
    )


def _warp_coords(flow_stack: jnp.ndarray, num_prev: jnp.ndarray):
    """Chained backward-warp coordinates for temporal voting.

    flow_stack: int16 [K, H, W, 2] S10.5 optical flow; flow_stack[0] is the
    current frame's flow (current -> previous), flow_stack[k] the k-th
    previous frame's.  Following planeseg.cu:210-227, every flow map is
    sampled at the ORIGINAL pixel coordinate (not the chained position), the
    integer part (>> 5) subtracted cumulatively.

    Returns (xs, ys) int32 [K, H, W]: position in the k-th previous frame,
    and in_bounds bool [K, H, W].
    """
    k, h, w, _ = flow_stack.shape
    fx = (flow_stack[..., 0].astype(jnp.int32)) >> 5
    fy = (flow_stack[..., 1].astype(jnp.int32)) >> 5
    cx = jnp.cumsum(fx, axis=0)
    cy = jnp.cumsum(fy, axis=0)
    x0 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    y0 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = x0[None] - cx
    ys = y0[None] - cy
    inb = (xs >= 0) & (ys >= 0) & (xs < w) & (ys < h)
    ks = jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 0)
    inb = inb & (ks < num_prev)
    return xs, ys, inb


def temporal_vote(
    current: jnp.ndarray,
    prev_planes: jnp.ndarray,
    flow_stack: jnp.ndarray,
    num_prev: jnp.ndarray,
    current_weight: int,
    compare_unknown: bool,
) -> jnp.ndarray:
    """Majority vote of current plane labels with warped previous labels.

    The reference-faithful formulation (every flow sampled at the original
    pixel, K separate warp gathers) — retained for A/B comparison; the
    production modules use `temporal_vote_warped` (one carried-accumulator
    gather per frame, chained sampling).

    current: uint8 [H, W]; prev_planes: uint8 [K, H, W] (k-th previous
    frame's unsmoothed planes); flow_stack per `_warp_coords`; num_prev:
    traced scalar number of valid history entries.

    current_weight: 1 for the pixel module (planeseg.cu:203-204), 2 for the
    superpixel module (sp_planeseg.cu:82).
    compare_unknown=False reproduces the pixel module's rule (winner is
    argmax(H, V), UNKNOWN only when both are 0; planeseg.cu:235-238);
    True reproduces the superpixel rule (UNKNOWN when votes[winner] <
    votes[UNKNOWN]; sp_planeseg.cu:113-116).
    """
    h, w = current.shape
    xs, ys, inb = _warp_coords(flow_stack, num_prev)
    xs = jnp.clip(xs, 0, w - 1)
    ys = jnp.clip(ys, 0, h - 1)
    # Gather prev_planes[k, ys[k,i,j], xs[k,i,j]] via a flat per-k gather.
    k = prev_planes.shape[0]
    flat = prev_planes.reshape(k, h * w)
    idx = (ys * w + xs).reshape(k, h * w)
    sampled = jnp.take_along_axis(flat, idx, axis=1).reshape(k, h, w)

    votes = []
    for plane in range(PLANE_COUNT):
        v = jnp.sum((sampled == plane) & inb, axis=0).astype(jnp.int32)
        v = v + jnp.where(current == plane, current_weight, 0)
        votes.append(v)

    winner = jnp.where(votes[HORIZONTAL] > votes[VERTICAL], HORIZONTAL, VERTICAL)
    wv = jnp.where(winner == HORIZONTAL, votes[HORIZONTAL], votes[VERTICAL])
    if compare_unknown:
        unknown = wv < votes[UNKNOWN]
    else:
        unknown = wv == 0
    return jnp.where(unknown, UNKNOWN, winner).astype(jnp.uint8)


WARP_INVALID = 3  # 2-bit sentinel: "no vote" (OOB or before first frame)


def temporal_vote_warped(
    current: jnp.ndarray,
    prev_planes: jnp.ndarray,
    warp_state: jnp.ndarray,
    flow: jnp.ndarray,
    current_weight: int,
    compare_unknown: bool,
    warp_mode: str = "auto",
    max_warp_y: int = 32,
    max_warp_x: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal majority vote via a carried warp accumulator.

    TPU-first re-design of the reference's temporal smoothing
    (planeseg.cu:199-241): instead of re-warping every previous frame's
    labels each frame (K separate full-image warps — the most expensive
    op in the whole pipeline), carry the already-warped vote stack across
    frames and warp it ONCE by the current flow:

        V_k(t) = warp_{f_t}(V_{k-1}(t-1)),   V_0 := planes(t-1)

    All K channels pack into one int32 word (labels are 2-bit), so ONE
    image warps regardless of K — and that warp runs as bounded dense
    multi-select shifts on TPU (ops/warp.py; per-index gather cost is
    the TPU killer) or as a single 469k-index gather elsewhere.

    Semantics note: this samples the k-th flow at the CHAINED position
    (the true backward trajectory); the reference samples every flow at
    the original pixel (planeseg.cu:210-227), an approximation of the
    same trajectory.  Equivalence is metric-gated in tests/test_quality.py.

    Args:
        current: uint8 [H, W] current-frame classification.
        prev_planes: uint8 [H, W] previous frame's unsmoothed planes.
        warp_state: uint8 [K, H, W] carried stack; channel c = planes from
            frame (t-1-c) warped into frame (t-1) coordinates; WARP_INVALID
            where no vote exists.  Initialize to WARP_INVALID.
        flow: int16 [H, W, 2] S10.5 current->previous flow.
        current_weight / compare_unknown: as in temporal_vote.
        warp_mode: 'select' warps via bounded dense multi-select shifts
            (ops/warp.py) — no gather, pixels moving farther than
            (max_warp_y, max_warp_x) get no vote; 'gather' is the
            unbounded per-index warp.  'auto' (default) picks 'select' on
            TPU (per-index gathers are the bottleneck there) and 'gather'
            elsewhere (the 2r+1 shifted copies bloat CPU compile time).

    Returns (voted uint8 [H, W], new warp_state uint8 [K, H, W]).
    """
    k, h, w = warp_state.shape
    assert 2 * (k + 1) <= 32, "pack limit: K+1 2-bit fields per int32"

    # Pack [planes(t-1), V_1..V_{K-1}] as 2-bit fields of one int32 image.
    stack_in = jnp.concatenate([prev_planes[None], warp_state[:-1]], axis=0)
    packed = jnp.zeros((h, w), jnp.int32)
    for c in range(k):
        packed = packed | (stack_in[c].astype(jnp.int32) << (2 * c))

    fx = flow[..., 0].astype(jnp.int32) >> 5
    fy = flow[..., 1].astype(jnp.int32) >> 5
    all_invalid = 0
    for c in range(k):
        all_invalid |= WARP_INVALID << (2 * c)

    if warp_mode == "auto":
        warp_mode = "select" if jax.default_backend() == "tpu" else "gather"
    if warp_mode == "select":
        from .warp import separable_warp

        warped, _ = separable_warp(
            packed, fy, fx, max_warp_y, max_warp_x, fill=all_invalid
        )
    else:
        x0 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        y0 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs, ys = x0 - fx, y0 - fy
        inb = (xs >= 0) & (ys >= 0) & (xs < w) & (ys < h)
        idx = (jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)).reshape(-1)

        # Two identical rows: XLA's row-batched gather path is ~1.7x faster
        # than the single-row form for the same index set.
        table = jnp.stack([packed.reshape(-1), packed.reshape(-1)])
        warped = jnp.take(table, idx, axis=1)[0].reshape(h, w)
        warped = jnp.where(inb, warped, all_invalid)

    new_state = jnp.stack(
        [((warped >> (2 * c)) & 3).astype(jnp.uint8) for c in range(k)], axis=0
    )

    votes = []
    for plane in range(PLANE_COUNT):
        v = jnp.sum((new_state == plane), axis=0).astype(jnp.int32)
        v = v + jnp.where(current == plane, current_weight, 0)
        votes.append(v)

    winner = jnp.where(votes[HORIZONTAL] > votes[VERTICAL], HORIZONTAL, VERTICAL)
    wv = jnp.where(winner == HORIZONTAL, votes[HORIZONTAL], votes[VERTICAL])
    if compare_unknown:
        unknown = wv < votes[UNKNOWN]
    else:
        unknown = wv == 0
    return jnp.where(unknown, UNKNOWN, winner).astype(jnp.uint8), new_state


def superpixel_vote(
    pixel_planes: jnp.ndarray,
    labels: jnp.ndarray,
    num_labels: int,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Aggregate per-pixel plane votes per superpixel and paint the winner.

    Mirrors sp_planeseg.cu:119-184: per-label counts of each class, winner
    starts at UNKNOWN, VERTICAL replaces it on strictly more votes, then
    HORIZONTAL replaces the running max on strictly more votes.

    axis_name (height-sharded mode): inputs are row shards; the per-label
    counts are psum'd over the mesh axis before the winner pass — exact
    integer counts, so bit-equal to the unsharded op for any shard count.
    """
    from .tally import label_tally, table_gather

    flat_labels = labels.reshape(-1).astype(jnp.int32)
    # Vote tally and winner paint both ride the MXU via the two-level
    # one-hot decomposition (ops/tally.py) — exact integer counts, no
    # scatter/gather (TPU scatter/gather cost is per-index).
    if axis_name is None and jax.default_backend() == "tpu":
        from .pallas.tally import vote_tally_pallas

        counts_lc = vote_tally_pallas(
            flat_labels, pixel_planes.reshape(-1), num_labels, PLANE_COUNT
        ).astype(jnp.int32)
    else:
        oh_votes = (
            pixel_planes.reshape(-1)[:, None]
            == jnp.arange(PLANE_COUNT, dtype=jnp.uint8)
        ).astype(jnp.bfloat16)
        counts_lc = label_tally(flat_labels, oh_votes, num_labels).astype(
            jnp.int32
        )
    if axis_name is not None:
        counts_lc = jax.lax.psum(counts_lc, axis_name)
    counts = [counts_lc[:, p] for p in range(PLANE_COUNT)]

    best = jnp.full((num_labels,), UNKNOWN, jnp.int32)
    best_votes = counts[UNKNOWN]
    take_v = counts[VERTICAL] > best_votes
    best = jnp.where(take_v, VERTICAL, best)
    best_votes = jnp.where(take_v, counts[VERTICAL], best_votes)
    take_h = counts[HORIZONTAL] > best_votes
    best = jnp.where(take_h, HORIZONTAL, best)

    return table_gather(best, labels).astype(jnp.uint8)

"""Contour-relaxation superpixels, TPU-native dense re-design.

The reference (src/modules/superpixels/contourrelaxation/) compacts border
pixels into a list (device atomics + per-iteration host sync) and evaluates
relabeling costs through device-side virtual feature objects.  None of that
maps to TPU.  Here:

  * features are *data*: per-label sufficient statistics (pixel count,
    per-channel sums, per-channel sum-of-squares) for every feature — all
    features count the same pixels, so the count row is shared;
  * every iteration is a dense synchronous sweep: all pixels evaluate the 9
    candidate labels of their 3x3 neighborhood; updates are masked to
    boundary pixels and applied in checkerboard phases (the reference's
    concurrent atomics are order-dependent; phased sync updates are the
    deterministic equivalent);
  * candidate stats come from ONE row-stacked table gather + spatial shifts
    (stats[labels[p+off]] == gathered_image[p+off]); the phase's stat
    update is a recomputation scatter-add;
  * costs use the delta form: the candidate-independent baseline
    (sum of all neighbor labels' costs, contourrelaxation.cu:130-144)
    drops out of the argmin, so
    cost(cand) = cliqueCost(cand)
      + sum_f w_f * [c'_f(old - pixel) + c'_f(cand + pixel)
                     - c_f(old) - c_f(cand)]
    with c'(label with count 0) = 0 (gaussian.cu:163-170).

Layout note (the round-2 rewrite): all per-pixel stat planes live
CHANNEL-MAJOR — a stack [R, H, W] with H/W on the (sublane, lane) tiles.
The previous channel-last [H, W, R] layout put R (= ~18) on the lane axis,
padding every tile to 128 lanes and wasting ~7x of VPU bandwidth on the
shift/cost pipeline, which dominated the whole flagship frame.

Cost models (gaussian.cu:30-43, compactness.cu:28-35):
  gaussian   : sum_ch [ n/2 log(2 pi var) + n/2 ] / n_channels,
               var floored at 1/12 (constants.hpp:35)
  compactness: sum_xy [ sumsq - sum^2/n ], optionally scaled by the
               progressive top-of-image factor (compactness.cu:183-188)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

_OOB = -1
# Candidate/neighbour traversal order = the reference's insertion order
# (x outer, y inner; getNeighbourLabels at contourrelaxation.cu:72-101),
# so first-strict-minimum selection reproduces its tie-breaking.
_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
_DIRECT = {(-1, 0), (1, 0), (0, -1), (0, 1)}


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    kind: str  # 'gaussian' | 'compactness'
    weight: float
    channels: int
    progressive: float = 0.0  # compactness only
    # Static (lo, hi) value bounds of this feature's data, if known
    # tighter than int16 — cuts the moment tally's byte-plane rows
    # (image channels are (0, 255)).  Compactness coords are derived
    # automatically; None = conservative int16.
    bounds: tuple[int, int] | None = None


def block_init_labels(height: int, width: int, block_w: int, block_h: int):
    """Regular-grid initialization (initialization.cu:12-59).

    Returns (labels int32 [H, W], max_label_id = nBlocksX * nBlocksY).
    """
    bx = -(-width // block_w)
    by = -(-height // block_h)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0) // block_h
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1) // block_w
    return (ys * bx + xs).astype(jnp.int32), bx * by


def _shift(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    h, w = x.shape
    py, px = abs(dy), abs(dx)
    xp = jnp.pad(x, ((py, py), (px, px)), constant_values=fill)
    return jax.lax.dynamic_slice(xp, (py + dy, px + dx), (h, w))


def _shift_stack(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift [R, H, W] spatially with edge padding (OOB masked by caller)."""
    r, h, w = x.shape
    py, px = abs(dy), abs(dx)
    xp = jnp.pad(x, ((0, 0), (py, py), (px, px)), mode="edge")
    return jax.lax.dynamic_slice(xp, (0, py + dy, px + dx), (r, h, w))


def _barrier_take(stats: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """stats[:, labels] stat-image gather (one site, so perf experiments
    on its lowering stay local — the in-context cost at KITTI geometry is
    ~0.95 ms/frame of gather + relayout copies, r5-profiled; isolated
    probes of the same shapes run at ~0.04 ms, so the slowdown is XLA
    layout assignment between the moment-tally and relax pallas calls,
    not the gather itself)."""
    return jnp.take(stats, labels, axis=1)


def _gaussian_cost(n, s, ss):
    """Gaussian NLL cost from channel-stacked moments; 0 when n == 0.

    n: [H, W] (or [L]); s, ss: [C, ...] matching trailing dims.
    """
    n_safe = jnp.maximum(n, 1.0)
    var = ss / n_safe - (s / n_safe) ** 2
    var = jnp.maximum(var, 1.0 / 12.0)
    per_ch = n / 2.0 * jnp.log(2.0 * math.pi * var) + n / 2.0
    cost = jnp.sum(per_ch, axis=0) / s.shape[0]
    return jnp.where(n > 0, cost, 0.0)


def _compact_cost(n, s, ss):
    n_safe = jnp.maximum(n, 1.0)
    per_ch = ss - (s * s) / n_safe
    cost = jnp.sum(per_ch, axis=0)
    return jnp.where(n > 0, cost, 0.0)


_COST_FN = {"gaussian": _gaussian_cost, "compactness": _compact_cost}


def init_stats(labels: jnp.ndarray, data: jnp.ndarray, num_labels: int,
               use_matmul: bool | None = None,
               channel_bounds: tuple | None = None,
               vma: tuple | None = None):
    """Channel-major stat table [1 + 2C, L]: count | sums | sum-squares.

    data: [C, H, W] float32 channel-major feature planes (integer-valued:
    image channels, derivatives, pixel coordinates).

    On TPU the per-label reduction runs as a blocked one-hot MATMUL on the
    MXU instead of a scatter (TPU scatter cost is per-index, ~4 ms/frame
    at KITTI geometry): every value is decomposed into bf16-exact byte
    planes, so the f32-accumulated products are exact integers up to the
    same 2^24-per-label bound the f32 scatter has.  Requires |values| <=
    32767 (int16-range features, true of every reference feature).
    """
    c = data.shape[0]
    flat = labels.reshape(-1)
    # Negative (OOB halo) labels must DROP, but negative scatter indices
    # wrap in JAX — remap them to the positive out-of-bounds sentinel.
    flat = jnp.where(flat < 0, num_labels, flat)
    d = data.reshape(c, -1)
    if use_matmul is None:
        use_matmul = jax.default_backend() == "tpu"
    if not use_matmul:
        rows = jnp.concatenate([jnp.ones_like(d[:1]), d, d * d], axis=0)
        return (
            jnp.zeros((1 + 2 * c, num_labels), jnp.float32)
            .at[:, flat]
            .add(rows)
        )

    if c <= 8 and jax.default_backend() == "tpu":
        # Fused TPU form: byte planes, Khatri-Rao masks, and count rows
        # are built in VMEM from the raw channel rows (ops/pallas/tally.py
        # moment_tally_pallas) — the [B, 50] operand assembly below cost
        # ~1.4 ms/frame of pure HBM glue at KITTI geometry.
        from .pallas.tally import moment_tally_pallas

        return moment_tally_pallas(
            flat, d, num_labels, channel_bounds=channel_bounds, vma=vma
        )

    # Byte-plane decomposition: v' = v + 32768 in [0, 2^17) -> 3 bytes;
    # v^2 < 2^30 -> 4 bytes.  All planes are 0..255 = exact in bf16.
    vi = d.astype(jnp.int32) + 32768
    sq = (vi - 32768) * (vi - 32768)
    cols = [jnp.ones((1, d.shape[1]), jnp.int32)]  # count
    scales: list[tuple[int, float]] = [(0, 1.0)]  # (col index, weight) per out
    sum_plan = []  # (channel, [(col, scale)...])
    for ch in range(c):
        plan = []
        for b in range(3):
            cols.append((vi[ch] >> (8 * b)) & 255)
            plan.append((len(cols) - 1, float(256 ** b)))
        sum_plan.append(plan)
    sq_plan = []
    for ch in range(c):
        plan = []
        for b in range(4):
            cols.append((sq[ch] >> (8 * b)) & 255)
            plan.append((len(cols) - 1, float(256 ** b)))
        sq_plan.append(plan)
    rhs = jnp.stack([x.reshape(-1) for x in cols], axis=-1).astype(jnp.bfloat16)

    from .tally import label_tally

    acc = label_tally(flat, rhs, num_labels)  # [L, ncols]

    count = acc[:, 0]
    out = [count]
    for ch in range(c):
        s = sum(acc[:, col] * w for col, w in sum_plan[ch]) - 32768.0 * count
        out.append(s)
    for ch in range(c):
        out.append(sum(acc[:, col] * w for col, w in sq_plan[ch]))
    return jnp.stack(out, axis=0)


def relax(
    labels: jnp.ndarray,
    feature_data: Sequence[jnp.ndarray],
    feature_specs: Sequence[FeatureSpec],
    num_labels: int,
    iterations: int,
    direct_cost: float,
    diagonal_cost: float,
    phases: int = 1,
    stats_refresh: str = "phase",
    backend: str = "auto",
    axis_name: str | None = None,
    row_offset=0,
    global_h: int | None = None,
    halo_rows: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Run `iterations` relaxation sweeps; returns the new label image.

    feature_data[i]: float32 [H, W, C_i] aligned with the gaussian entries
    of feature_specs; compactness uses implicit (x, y) coords — pass specs
    with kind='compactness' but no data.

    phases: checkerboard sub-phases per sweep.  1 matches the reference's
    fully-concurrent border update; 2 gives race-free alternating updates.
    stats_refresh: 'phase' recomputes label statistics after every update
    (the reference's incremental-atomics semantics); 'frame' keeps the
    statistics fixed for the whole call — faster, slight quality drift
    bounded by the per-frame refresh.

    Height-sharded mode (parallel/spatial_flagship.py): `axis_name` set
    makes the per-label statistics global (psum over the mesh axis),
    `row_offset` shifts the compactness coordinates to global rows, and
    `global_h` is the full image height.  OOB halo labels (< 0) behave
    exactly like image edges (candidate masking).  'phase' stats mode
    re-tallies the (core-row) moments and psums them after every phase,
    so sharded faithful mode is bit-equal to the unsharded op whenever
    the halo depth covers iterations * phases rows of label influence.
    """
    h, w = labels.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + row_offset
    coords = jnp.stack([xs, ys], axis=0)  # [2, H, W]

    gh = float(global_h) if global_h is not None else float(h)
    data_list, specs, ch_bounds = [], [], []
    it = iter(feature_data)
    for spec in feature_specs:
        if spec.kind == "compactness":
            data_list.append(coords)
            # Core-pixel coords are global: x < W, y < global H.  (Halo
            # pixels may fall outside — they are masked from the tally.)
            cb = (0, max(w, int(gh)) - 1)
            ch_bounds += [cb, cb]
        else:
            nxt = next(it)
            # Accept [H, W, C] (module convention) -> channel-major.
            if nxt.ndim == 3:
                nxt = jnp.moveaxis(nxt, -1, 0)
            else:
                nxt = nxt[None]
            data_list.append(nxt.astype(jnp.float32))
            ch_bounds += [tuple(spec.bounds) if spec.bounds is not None
                          else (-32768, 32767)] * nxt.shape[0]
        specs.append(spec)

    data_all = jnp.concatenate(data_list, axis=0)  # [C_total, H, W]
    c_total = data_all.shape[0]
    # Per-feature channel slices within the packed channel-major layout.
    ch_off = []
    o = 0
    for dpart in data_list:
        ch_off.append((o, dpart.shape[0]))
        o += dpart.shape[0]

    # Row layout of the packed table / gathered image:
    #   row 0          : n
    #   rows 1..C      : per-channel sums
    #   rows 1+C..2C   : per-channel sum-squares
    #   rows 1+2C..+F  : per-feature current label cost (appended per phase)
    nstat = 1 + 2 * c_total

    def feature_costs(img):
        """Per-feature cost list from a stacked stat image/table [nstat, ...]."""
        n = img[0]
        out = []
        for spec, (off, c) in zip(specs, ch_off):
            s = img[1 + off : 1 + off + c]
            ss = img[1 + c_total + off : 1 + c_total + off + c]
            out.append(_COST_FN[spec.kind](n, s, ss))
        return out

    # OOB/halo labels (< 0) drop out of the tally (scatter-drop semantics /
    # no one-hot match); under sharding the per-label moments are summed
    # over the mesh axis so every shard sees the GLOBAL statistics.
    # halo_rows marks rows owned by NEIGHBOR shards: they participate in
    # the sweeps (their stats/labels are read as candidates) but are
    # excluded from the local tally so the psum counts each pixel once.
    tally_labels = labels
    ht, hb_ = halo_rows
    core = None
    if ht or hb_:
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        core = (rows_i >= ht) & (rows_i < h - hb_)
        tally_labels = jnp.where(core, labels, _OOB)
    vma = (axis_name,) if axis_name is not None else None
    stats0 = init_stats(
        tally_labels, data_all, num_labels,
        channel_bounds=tuple(ch_bounds), vma=vma,
    )  # [nstat, L]
    if axis_name is not None:
        stats0 = jax.lax.psum(stats0, axis_name)

    prog_factor = None
    for spec in specs:
        if spec.kind == "compactness" and spec.progressive > 0.0:
            # `ys` already carries `row_offset`, so the factor is computed
            # from GLOBAL rows — identical on every shard of a sharded run.
            prog_factor = 1.0 + spec.progressive * (gh - ys) / gh

    pixel_rows = jnp.concatenate(
        [jnp.ones((1, h, w), jnp.float32), data_all, data_all * data_all],
        axis=0,
    )  # [nstat, H, W]: each pixel's contribution to its label's stats

    update_stats = stats_refresh == "phase"

    def phase_update(labels, stat_img, phase, num_phases):
        """One synchronous sweep given the per-pixel stat image.

        Returns (new_labels, upd_img, active) where upd_img holds the
        WINNING candidate's stat rows per pixel — for the fixed-table
        ('frame') mode the caller carries the stat image forward as
        where(active, upd_img, stat_img), which is exact because each
        pixel's rows are a pure lookup of its (new) label.
        """
        nbs = [_shift(labels, dy, dx, _OOB) for (dx, dy) in _OFFSETS]
        boundary = jnp.zeros((h, w), bool)
        for (dx, dy), nb in zip(_OFFSETS, nbs):
            if dx == 0 and dy == 0:
                continue
            boundary = boundary | ((nb != _OOB) & (nb != labels))

        if num_phases == 1:
            active = boundary
        else:
            # GLOBAL-row checkerboard parity: under sharding the phase
            # pattern must be continuous across shard seams, so the row
            # iota is offset to global coordinates (no-op unsharded).
            pm = (
                jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
                + jnp.asarray(row_offset, jnp.int32)
                + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            ) % num_phases
            active = boundary & (pm == phase)
        # OOB pixels (global-edge halo fill under sharding) must stay OOB:
        # a relabeled -1 pixel would present a real neighbor where the
        # full-frame op sees the image border, corrupting the edge rows
        # from the second sweep on.  No-op unsharded (labels are never -1).
        active = active & (labels != _OOB)

        # Label costs are re-derived per pixel from the moment rows
        # (identical values; a handful of VPU logs beats gathering or
        # carrying F more rows).
        cost_img = feature_costs(stat_img)  # F x [H, W]

        # Old-label per-pixel quantities (candidate-independent).
        old_minus = feature_costs(stat_img - pixel_rows)
        old_cost = cost_img

        best_cost = jnp.full((h, w), jnp.inf, jnp.float32)
        best_label = labels
        upd_img = stat_img
        for (dx, dy), cand in zip(_OFFSETS, nbs):
            cand_valid = cand != _OOB
            cand_c = jnp.where(cand_valid, cand, 0)
            cand_img = _shift_stack(stat_img, dy, dx)
            # cost is a pointwise function of the moments, so the shifted
            # cost image IS the candidate label's cost.
            cand_cost = [_shift(ci, dy, dx, 0.0) for ci in cost_img]

            # Clique cost for this candidate (contourrelaxation.cu:108-128).
            clique = jnp.zeros((h, w), jnp.float32)
            for (dx2, dy2), nb2 in zip(_OFFSETS, nbs):
                if dx2 == 0 and dy2 == 0:
                    continue
                ccost = direct_cost if (dx2, dy2) in _DIRECT else diagonal_cost
                clique = clique + jnp.where(
                    (nb2 != _OOB) & (nb2 != cand_c), ccost, 0.0
                ).astype(jnp.float32)

            cand_plus = feature_costs(cand_img + pixel_rows)

            total = clique
            is_old = cand_c == labels
            for i, spec in enumerate(specs):
                delta = old_minus[i] + cand_plus[i] - old_cost[i] - cand_cost[i]
                if spec.kind == "compactness" and prog_factor is not None:
                    delta = delta * prog_factor
                total = total + spec.weight * jnp.where(is_old, 0.0, delta)

            total = jnp.where(cand_valid, total, jnp.float32(jnp.inf))
            # Strict < keeps the first minimum (insertion-order tie-break).
            take = total < best_cost
            best_cost = jnp.where(take, total, best_cost)
            best_label = jnp.where(take, cand_c, best_label)
            upd_img = jnp.where(take[None], cand_img, upd_img)

        new_labels = jnp.where(active, best_label, labels)
        return new_labels, upd_img, active

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    use_pallas = backend in ("pallas", "pallas_interpret")
    if use_pallas:
        from .pallas.relax import relax_phase_pallas

        meta = dict(
            ch_off=tuple(ch_off),
            kinds=tuple(s.kind for s in specs),
            weights=tuple(float(s.weight) for s in specs),
            progressive=tuple(float(s.progressive) for s in specs),
            direct_cost=float(direct_cost),
            diagonal_cost=float(diagonal_cost),
            num_phases=phases,
            global_h=int(gh),
            vma=(axis_name,) if axis_name is not None else None,
            interpret=backend == "pallas_interpret",
        )
        # Global row of the array's first row (traced under sharding):
        # the kernel needs it for the progressive factor and the
        # checkerboard parity, both defined on GLOBAL rows.
        row0 = jnp.asarray(row_offset, jnp.int32).reshape(1)

    if update_stats:
        # Reference-faithful mode: statistics refresh after every sweep, so
        # the stat image must be re-gathered from the re-tallied table.
        # Sharded: only core rows tally (halo pixels are the neighbor's
        # core), negative/OOB labels remap to the dropped sentinel index,
        # and the moments psum to global — so every shard re-gathers
        # identical statistics after each phase.  The re-tally goes
        # through init_stats so it rides the MXU moment-tally kernel on
        # TPU (bit-equal to the scatter: both are exact integer sums).
        def retally(lab):
            tl = lab if core is None else jnp.where(core, lab, _OOB)
            s = init_stats(
                tl, data_all, num_labels,
                channel_bounds=tuple(ch_bounds), vma=vma,
            )
            if axis_name is not None:
                s = jax.lax.psum(s, axis_name)
            return s

        if use_pallas:
            # Per-phase: gather the (fresh, global) stat image, run the
            # fused sweep kernel (its carried stat output is discarded —
            # faithful mode re-derives statistics), re-tally.  ~3x the
            # per-sweep cost of 'frame' mode instead of the XLA path's
            # dense scatter + sweep (~5x slower than this).
            stats = stats0
            for _ in range(iterations):
                for phase in range(phases):
                    stat_img = _barrier_take(stats, labels)
                    labels, _ = relax_phase_pallas(
                        labels, stat_img, pixel_rows, row0,
                        phase=phase, **meta
                    )
                    stats = retally(labels)
            return labels

        def one_iteration(carry, _):
            labels, stats = carry
            for phase in range(phases):
                stat_img = jnp.take(stats, labels, axis=1)
                labels, _, _ = phase_update(labels, stat_img, phase, phases)
                stats = retally(labels)
            return (labels, stats), None

        (labels, _), _ = jax.lax.scan(
            one_iteration, (labels, stats0), None, length=iterations
        )
    else:
        # Fixed-table mode: gather ONCE, then carry the per-pixel stat
        # image across sweeps, updating changed pixels from the winning
        # candidate's (already shifted) rows — no per-phase gather or
        # scatter at all.
        stat_img0 = _barrier_take(stats0, labels)

        if use_pallas:
            # Python-unrolled iterations: the kernel calls are compact HLO,
            # and unrolling avoids lax.scan's double-buffered copies of the
            # [nstat, H, W] carry (a few ms/frame at KITTI geometry).
            stat_img = stat_img0
            for _ in range(iterations):
                for phase in range(phases):
                    labels, stat_img = relax_phase_pallas(
                        labels, stat_img, pixel_rows, row0,
                        phase=phase, **meta
                    )
            return labels

        def one_iteration(carry, _):
            labels, stat_img = carry
            for phase in range(phases):
                new_labels, upd_img, active = phase_update(
                    labels, stat_img, phase, phases
                )
                stat_img = jnp.where(active[None], upd_img, stat_img)
                labels = new_labels
            return (labels, stat_img), None

        (labels, _), _ = jax.lax.scan(
            one_iteration, (labels, stat_img0), None, length=iterations
        )
    return labels


def boundary_mask(labels: jnp.ndarray) -> jnp.ndarray:
    """8-neighborhood label-boundary mask (computeBoundaries kernel)."""
    out = jnp.zeros(labels.shape, bool)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nb = _shift(labels, dy, dx, _OOB)
            out = out | ((nb != _OOB) & (nb != labels))
    return out

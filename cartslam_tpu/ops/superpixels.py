"""Contour-relaxation superpixels, TPU-native dense re-design.

The reference (src/modules/superpixels/contourrelaxation/) compacts border
pixels into a list (device atomics + per-iteration host sync) and evaluates
relabeling costs through device-side virtual feature objects.  None of that
maps to TPU.  Here:

  * features are *data*: per-label sufficient-statistic tables
    (count, sum, sum-of-squares per channel) built with scatter-adds;
  * every iteration is a dense synchronous sweep: all pixels evaluate the 9
    candidate labels of their 3x3 neighborhood; updates are masked to
    boundary pixels and applied in checkerboard phases (the reference's
    concurrent atomics are order-dependent; phased sync updates are the
    deterministic equivalent);
  * costs use the delta form: since the candidate-independent baseline
    (sum of all neighbor labels' costs, contourrelaxation.cu:130-144) drops
    out of the argmin, cost(cand) = cliqueCost(cand)
      + sum_f w_f * [c'_f(old - pixel) + c'_f(cand + pixel)
                     - c_f(old) - c_f(cand)]
    with c'(label with count 0) = 0 (gaussian.cu:163-170).

Cost models (gaussian.cu:30-43, compactness.cu:28-35):
  gaussian   : sum_ch [ n/2 log(2 pi var) + n/2 ] / n_channels,
               var floored at 1/12 (constants.hpp:35)
  compactness: sum_xy [ sumsq - sum^2/n ], optionally scaled by the
               progressive top-of-image factor (compactness.cu:183-188)
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp

_OOB = -1
# Candidate/neighbour traversal order = the reference's insertion order
# (x outer, y inner; getNeighbourLabels at contourrelaxation.cu:72-101),
# so first-minimum argmin reproduces its tie-breaking.
_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
_DIRECT = {(-1, 0), (1, 0), (0, -1), (0, 1)}


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    kind: str  # 'gaussian' | 'compactness'
    weight: float
    channels: int
    progressive: float = 0.0  # compactness only


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


def init_stats(labels: jnp.ndarray, data: jnp.ndarray, num_labels: int):
    """(count [L], sum [L,C], sumsq [L,C]) via scatter-add."""
    flat = labels.reshape(-1)
    d = data.reshape(-1, data.shape[-1]).astype(jnp.float32)
    count = jnp.zeros((num_labels,), jnp.float32).at[flat].add(1.0)
    s = jnp.zeros((num_labels, d.shape[-1]), jnp.float32).at[flat].add(d)
    ss = jnp.zeros((num_labels, d.shape[-1]), jnp.float32).at[flat].add(d * d)
    return count, s, ss


def _gaussian_label_cost(n, s, ss):
    """Per-label gaussian NLL cost, summed over channels / n_channels."""
    n_safe = jnp.maximum(n, 1.0)
    var = ss / n_safe[..., None] - (s / n_safe[..., None]) ** 2
    var = jnp.maximum(var, 1.0 / 12.0)
    per_ch = n[..., None] / 2.0 * jnp.log(2.0 * math.pi * var) + n[..., None] / 2.0
    cost = jnp.sum(per_ch, axis=-1) / s.shape[-1]
    return jnp.where(n > 0, cost, 0.0)


def _compact_label_cost(n, s, ss):
    n_safe = jnp.maximum(n, 1.0)
    per_ch = ss - (s * s) / n_safe[..., None]
    cost = jnp.sum(per_ch, axis=-1)
    return jnp.where(n > 0, cost, 0.0)


_COST_FN = {"gaussian": _gaussian_label_cost, "compactness": _compact_label_cost}


def relax(
    labels: jnp.ndarray,
    feature_data: Sequence[jnp.ndarray],
    feature_specs: Sequence[FeatureSpec],
    num_labels: int,
    iterations: int,
    direct_cost: float,
    diagonal_cost: float,
    phases: int = 2,
) -> jnp.ndarray:
    """Run `iterations` relaxation sweeps; returns the new label image.

    feature_data[i]: float32 [H, W, C_i] (compactness uses (x, y) coords,
    appended automatically — do NOT pass it).
    """
    h, w = labels.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    coords = jnp.stack([xs, ys], axis=-1)

    data_list = []
    specs = []
    for d, spec in zip(feature_data, feature_specs):
        if spec.kind == "compactness":
            raise ValueError("compactness data is implicit")
        data_list.append(d.astype(jnp.float32))
        specs.append(spec)
    for spec in feature_specs:
        if spec.kind == "compactness":
            data_list.append(coords)
            specs.append(spec)

    stats = [init_stats(labels, d, num_labels) for d in data_list]

    # Progressive compactness factor per pixel (compactness.cu:183-188).
    prog = {}
    for i, spec in enumerate(specs):
        if spec.kind == "compactness" and spec.progressive > 0.0:
            prog[i] = 1.0 + spec.progressive * (h - ys) / float(h)

    def phase_update(labels, stats, phase, num_phases):
        nbs = [_shift(labels, dy, dx, _OOB) for (dx, dy) in _OFFSETS]
        center = labels
        boundary = jnp.zeros((h, w), bool)
        for (dx, dy), nb in zip(_OFFSETS, nbs):
            if dx == 0 and dy == 0:
                continue
            boundary = boundary | ((nb != _OOB) & (nb != center))

        if num_phases == 1:
            phase_mask = jnp.ones((h, w), bool)
        else:
            pm = (
                jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
                + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            ) % num_phases
            phase_mask = pm == phase
        active = boundary & phase_mask

        # Current per-label costs (tables, cheap: [L]).
        label_costs = [
            _COST_FN[spec.kind](n, s, ss) for spec, (n, s, ss) in zip(specs, stats)
        ]

        # Old-label stats at each pixel, and cost of old-minus-pixel.
        old = labels
        per_pixel_old_minus = []
        per_pixel_old_cost = []
        for (n, s, ss), d, spec, lc in zip(stats, data_list, specs, label_costs):
            n_o = n[old]
            s_o = s[old]
            ss_o = ss[old]
            c_minus = _COST_FN[spec.kind](n_o - 1.0, s_o - d, ss_o - d * d)
            per_pixel_old_minus.append(c_minus)
            per_pixel_old_cost.append(lc[old])

        costs = []
        for (dx, dy), cand in zip(_OFFSETS, nbs):
            cand_valid = cand != _OOB
            cand_c = jnp.where(cand_valid, cand, 0)

            # Clique cost for this candidate (contourrelaxation.cu:108-128).
            clique = jnp.zeros((h, w), jnp.float32)
            for (dx2, dy2), nb2 in zip(_OFFSETS, nbs):
                if dx2 == 0 and dy2 == 0:
                    continue
                ccost = direct_cost if (dx2, dy2) in _DIRECT else diagonal_cost
                clique = clique + jnp.where(
                    (nb2 != _OOB) & (nb2 != cand_c), ccost, 0.0
                ).astype(jnp.float32)

            total = clique
            is_old = cand_c == old
            for i, ((n, s, ss), d, spec) in enumerate(zip(stats, data_list, specs)):
                n_c = n[cand_c]
                s_c = s[cand_c]
                ss_c = ss[cand_c]
                c_cand = _COST_FN[spec.kind](n_c, s_c, ss_c)
                c_plus = _COST_FN[spec.kind](n_c + 1.0, s_c + d, ss_c + d * d)
                delta = (
                    per_pixel_old_minus[i]
                    + c_plus
                    - per_pixel_old_cost[i]
                    - c_cand
                )
                if i in prog:
                    delta = delta * prog[i]
                total = total + spec.weight * jnp.where(is_old, 0.0, delta)

            total = jnp.where(cand_valid, total, jnp.float32(jnp.inf))
            costs.append(total)

        cost_stack = jnp.stack(costs, axis=0)  # [9, H, W]
        best_idx = jnp.argmin(cost_stack, axis=0)  # first minimum wins
        cand_stack = jnp.stack([jnp.where(c == _OOB, old, c) for c in nbs], axis=0)
        new_label = jnp.take_along_axis(cand_stack, best_idx[None], axis=0)[0]
        new_labels = jnp.where(active, new_label, labels)

        # Apply stat deltas for changed pixels.
        changed = new_labels != labels
        flat_old = labels.reshape(-1)
        flat_new = new_labels.reshape(-1)
        wgt = changed.reshape(-1).astype(jnp.float32)
        new_stats = []
        for (n, s, ss), d in zip(stats, data_list):
            dd = d.reshape(-1, d.shape[-1])
            n2 = n.at[flat_old].add(-wgt).at[flat_new].add(wgt)
            s2 = s.at[flat_old].add(-dd * wgt[:, None]).at[flat_new].add(dd * wgt[:, None])
            ss2 = (
                ss.at[flat_old]
                .add(-dd * dd * wgt[:, None])
                .at[flat_new]
                .add(dd * dd * wgt[:, None])
            )
            new_stats.append((n2, s2, ss2))
        return new_labels, new_stats

    def one_iteration(carry, _):
        labels, stats = carry
        for phase in range(phases):
            labels, stats = phase_update(labels, stats, phase, phases)
        return (labels, stats), None

    (labels, _), _ = jax.lax.scan(
        one_iteration, (labels, stats), None, length=iterations
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

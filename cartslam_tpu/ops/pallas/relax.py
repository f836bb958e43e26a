"""Contour-relaxation phase sweep as a fused Pallas TPU kernel.

One phase of the dense relaxation (ops/superpixels.py:phase_update) costs
~2 ms/iteration in XLA at KITTI geometry — dominated by materializing the
nine shifted [n_stat, H, W] candidate stat stacks in HBM.  This kernel
keeps a row band of the stat image (plus 1-row halos) in VMEM and runs the
whole candidate sweep there: the shifted views become static slices, the
Gaussian/compactness delta costs and the clique costs are VPU chains on
[hb, W] planes, and only the updated band is written back.

Semantics are IDENTICAL to the jnp path (same traversal order, same
strict-< tie-break, same edge conventions: OOB candidate labels masked,
edge-clamped stat halos); tests/test_relax_pallas.py asserts
bit-equality in interpret mode.  Fixed-table ('frame') statistics mode
only — the carried stat image is updated from the winning candidate's
rows exactly like the jnp path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OOB = -1
_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
_DIRECT = {(-1, 0), (1, 0), (0, -1), (0, 1)}


def _vma_kw(vma):
    """ShapeDtypeStruct kwargs declaring shard_map varying axes, if any."""
    return {"vma": frozenset(vma)} if vma else {}


def _make_phase_kernel(
    hb, w, nstat, c_total, ch_off, kinds, weights, progressive,
    direct_cost, diagonal_cost, phase, num_phases, real_h, img_h,
):
    """ch_off: tuple of (offset, channels) per feature; kinds/weights
    aligned; progressive: per-feature progressive factor (0 = off)."""

    def gaussian_cost(n, s_list, ss_list):
        per = None
        for s, ss in zip(s_list, ss_list):
            n_safe = jnp.maximum(n, 1.0)
            var = jnp.maximum(ss / n_safe - (s / n_safe) ** 2, 1.0 / 12.0)
            t = n / 2.0 * jnp.log(2.0 * math.pi * var) + n / 2.0
            per = t if per is None else per + t
        cost = per / len(s_list)
        return jnp.where(n > 0, cost, 0.0)

    def compact_cost(n, s_list, ss_list):
        per = None
        for s, ss in zip(s_list, ss_list):
            t = ss - (s * s) / jnp.maximum(n, 1.0)
            per = t if per is None else per + t
        return jnp.where(n > 0, per, 0.0)

    def feature_costs(rows):
        """rows: list of nstat [hb, W] planes -> per-feature cost planes."""
        n = rows[0]
        out = []
        for kind, (off, c) in zip(kinds, ch_off):
            s_list = [rows[1 + off + k] for k in range(c)]
            ss_list = [rows[1 + c_total + off + k] for k in range(c)]
            out.append(
                gaussian_cost(n, s_list, ss_list)
                if kind == "gaussian"
                else compact_cost(n, s_list, ss_list)
            )
        return out

    def kernel(row0, labp, labc, labn, stp, stc, stn, pix, out_lab, out_stat):
        i = pl.program_id(0)
        # Assembled [hb+2, W] label window and [nstat, hb+2, W] stat window
        # from single-row halo arrays (pre-sliced per band by the caller;
        # the content at the true image edges is never read —
        # lab_shift/stat_shift mask those rows).
        lab = jnp.concatenate([labp[0], labc[...], labn[0]], axis=0)
        st = jnp.concatenate(
            [stp[0][:, None, :], stc[...], stn[0][:, None, :]], axis=1
        )

        gr0 = i * hb  # array row of the band's first row
        rows = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 0) + gr0
        cols = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 1)
        # Global image rows (row0 = global row of array row 0; nonzero for
        # height shards): the progressive factor and the checkerboard
        # parity are defined on global rows.  OOB masking stays on local
        # array rows (real_h) — halo fills handle the global borders.
        grows = rows + row0[0]

        def lab_shift(dy, dx):
            """labels[y+dy, x+dx] with OOB -> _OOB (matches _shift)."""
            v = lab[1 + dy : 1 + dy + hb]
            if dx > 0:
                v = jnp.concatenate([v[:, dx:], v[:, -1:]], axis=1)
            elif dx < 0:
                v = jnp.concatenate([v[:, :1], v[:, :dx]], axis=1)
            oob = (rows + dy < 0) | (rows + dy >= real_h)
            if dx > 0:
                oob = oob | (cols + dx >= w)
            elif dx < 0:
                oob = oob | (cols + dx < 0)
            return jnp.where(oob, _OOB, v)

        def stat_shift(dy, dx):
            """Edge-clamped shifted stat rows (matches _shift_stack)."""
            v = st[:, 1 + dy : 1 + dy + hb]
            if dy != 0:
                # Vertical edge clamp at the true image borders.
                oobv = (rows + dy < 0) | (rows + dy >= real_h)
                v = jnp.where(oobv[None], st[:, 1 : 1 + hb], v)
            if dx > 0:
                v = jnp.concatenate([v[:, :, dx:], v[:, :, -1:]], axis=2)
            elif dx < 0:
                v = jnp.concatenate([v[:, :, :1], v[:, :, :dx]], axis=2)
            return [v[k] for k in range(nstat)]

        labels = lab[1 : 1 + hb]
        nbs = {}
        boundary = jnp.zeros((hb, w), bool)
        for (dx, dy) in _OFFSETS:
            nb = lab_shift(dy, dx)
            nbs[(dx, dy)] = nb
            if dx == 0 and dy == 0:
                continue
            boundary = boundary | ((nb != _OOB) & (nb != labels))

        if num_phases == 1:
            active = boundary
        else:
            active = boundary & ((grows + cols) % num_phases == phase)
        # OOB pixels (global-edge halo fill under sharding) stay OOB —
        # matches ops/superpixels.py:phase_update; no-op unsharded.
        active = active & (labels != _OOB)

        stat_rows = [st[k, 1 : 1 + hb] for k in range(nstat)]
        pix_rows = [pix[k] for k in range(nstat)]
        # Label costs on the EXTENDED window, once: cost is a pointwise
        # function of the moments, so every candidate's cost image is a
        # shift of this one (same clamps as stat_shift => bit-identical
        # to recomputing from the shifted moments).  Evaluating the
        # Gaussian NLL once on hb+2 rows instead of once per candidate
        # halves the kernel's transcendental (log) work.
        cost_ext = feature_costs([st[k] for k in range(nstat)])
        cost_img = [ce[1 : 1 + hb] for ce in cost_ext]
        old_minus = feature_costs(
            [a - b for a, b in zip(stat_rows, pix_rows)]
        )

        def cost_shift(dy, dx):
            """Shifted label-cost planes, mirroring stat_shift's clamps."""
            out = []
            for ce in cost_ext:
                v = ce[1 + dy : 1 + dy + hb]
                if dy != 0:
                    oobv = (rows + dy < 0) | (rows + dy >= real_h)
                    v = jnp.where(oobv, ce[1 : 1 + hb], v)
                if dx > 0:
                    v = jnp.concatenate([v[:, dx:], v[:, -1:]], axis=1)
                elif dx < 0:
                    v = jnp.concatenate([v[:, :1], v[:, :dx]], axis=1)
                out.append(v)
            return out

        prog = None
        if any(p > 0.0 for p in progressive):
            pval = max(progressive)
            prog = 1.0 + pval * (img_h - grows.astype(jnp.float32)) / float(img_h)

        best_cost = jnp.full((hb, w), jnp.inf, jnp.float32)
        best_label = labels
        upd = list(stat_rows)
        for (dx, dy) in _OFFSETS:
            cand = nbs[(dx, dy)]
            cand_valid = cand != _OOB
            cand_c = jnp.where(cand_valid, cand, 0)
            cand_rows = stat_shift(dy, dx)

            clique = jnp.zeros((hb, w), jnp.float32)
            for (dx2, dy2) in _OFFSETS:
                if dx2 == 0 and dy2 == 0:
                    continue
                nb2 = nbs[(dx2, dy2)]
                cc = direct_cost if (dx2, dy2) in _DIRECT else diagonal_cost
                clique = clique + jnp.where(
                    (nb2 != _OOB) & (nb2 != cand_c), cc, 0.0
                ).astype(jnp.float32)

            total = clique
            if (dx, dy) != (0, 0):
                # The center candidate IS the old label wherever it is
                # valid, so its feature delta is where()'d to zero —
                # skip the evaluation entirely.
                cand_cost = cost_shift(dy, dx)
                cand_plus = feature_costs(
                    [a + b for a, b in zip(cand_rows, pix_rows)]
                )
                is_old = cand_c == labels
                for fidx, kind in enumerate(kinds):
                    delta = (
                        old_minus[fidx]
                        + cand_plus[fidx]
                        - cost_img[fidx]
                        - cand_cost[fidx]
                    )
                    if kind == "compactness" and prog is not None:
                        delta = delta * prog
                    total = total + weights[fidx] * jnp.where(
                        is_old, 0.0, delta
                    )

            total = jnp.where(cand_valid, total, jnp.float32(jnp.inf))
            take = total < best_cost
            best_cost = jnp.where(take, total, best_cost)
            best_label = jnp.where(take, cand_c, best_label)
            upd = [jnp.where(take, c, u) for c, u in zip(cand_rows, upd)]

        new_labels = jnp.where(active, best_label, labels)
        out_lab[...] = new_labels
        for k in range(nstat):
            out_stat[k] = jnp.where(active, upd[k], stat_rows[k])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "ch_off", "kinds", "weights", "progressive", "direct_cost",
        "diagonal_cost", "phase", "num_phases", "global_h", "vma",
        "interpret",
    ),
)
def relax_phase_pallas(
    labels: jnp.ndarray,
    stat_img: jnp.ndarray,
    pixel_rows: jnp.ndarray,
    row0: jnp.ndarray | None = None,
    *,
    ch_off: tuple,
    kinds: tuple,
    weights: tuple,
    progressive: tuple,
    direct_cost: float,
    diagonal_cost: float,
    phase: int,
    num_phases: int,
    global_h: int | None = None,
    vma: tuple | None = None,
    interpret: bool = False,
):
    """One fixed-table relaxation sweep.  Returns (new_labels, new_stat).

    row0: [1] int32, global image row of `labels` row 0 (0 unsharded —
    height shards pass their offset so the progressive factor and the
    phase parity stay global-row-defined); global_h: full image height.
    vma: mesh axis names the outputs vary over — REQUIRED when called
    inside shard_map(check_vma=True) (pallas_call outputs must declare
    their varying type).
    """
    h, w = labels.shape
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    nstat = stat_img.shape[0]
    c_total = (nstat - 1) // 2
    hb = 8
    hp = -(-h // hb) * hb
    if hp != h:
        labels = jnp.pad(labels, ((0, hp - h), (0, 0)))
        stat_img = jnp.pad(stat_img, ((0, 0), (0, hp - h), (0, 0)))
        pixel_rows = jnp.pad(pixel_rows, ((0, 0), (0, hp - h), (0, 0)))
    nblk = hp // hb

    # Single-row halos, pre-sliced per band: fetching whole neighbor bands
    # tripled the stat-image DMA traffic per sweep, and Mosaic forbids
    # 1-row blocks of a 2-D array, so the halos are materialized as
    # [nblk, ., w] arrays whose trailing block dims equal the array dims.
    # Band i's halo rows are i*hb - 1 and (i+1)*hb (edge rows unused —
    # masked in-kernel).
    def halo_rows(arr, axis):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(hb - 1, hp - 1, hb)
        prev = jnp.concatenate(
            [jax.lax.slice_in_dim(arr, 0, 1, axis=axis),
             arr[tuple(idx)]], axis=axis,
        )
        idx[axis] = slice(hb, None, hb)
        nxt = jnp.concatenate(
            [arr[tuple(idx)],
             jax.lax.slice_in_dim(arr, hp - 1, hp, axis=axis)], axis=axis,
        )
        return prev, nxt

    lab_prev, lab_next = halo_rows(labels, 0)  # [nblk, w] each
    st_prev, st_next = halo_rows(stat_img, 1)  # [nstat, nblk, w]
    lab_prev = lab_prev[:, None, :]  # [nblk, 1, w]
    lab_next = lab_next[:, None, :]
    st_prev = jnp.transpose(st_prev, (1, 0, 2))  # [nblk, nstat, w]
    st_next = jnp.transpose(st_next, (1, 0, 2))

    lab_spec = pl.BlockSpec(
        (hb, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    lab_halo = pl.BlockSpec(
        (1, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    st_spec = pl.BlockSpec(
        (nstat, hb, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    st_halo = pl.BlockSpec(
        (1, nstat, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    kern = _make_phase_kernel(
        hb, w, nstat, c_total, ch_off, kinds, weights, progressive,
        direct_cost, diagonal_cost, phase, num_phases, real_h=h,
        img_h=int(global_h) if global_h is not None else h,
    )
    row0_spec = pl.BlockSpec(
        (1,), lambda i: (0,), memory_space=pltpu.SMEM
    )
    new_labels, new_stat = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            row0_spec,
            lab_halo, lab_spec, lab_halo,
            st_halo, st_spec, st_halo,
            st_spec,  # pixel_rows, current band only
        ],
        out_specs=[
            pl.BlockSpec((hb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nstat, hb, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, w), jnp.int32, **_vma_kw(vma)),
            jax.ShapeDtypeStruct((nstat, hp, w), jnp.float32,
                                 **_vma_kw(vma)),
        ],
        interpret=interpret,
    )(row0, lab_prev, labels, lab_next, st_prev, stat_img, st_next,
      pixel_rows)
    return new_labels[:h], new_stat[:, :h]

"""SGM winner-take-all + uniqueness + subpixel + LR check row pipeline.

`wta_lr_row` runs the entire WTA/LR post-processing on one [D, W] row
plane in VMEM (sublanes = D, lanes = W): keyed min-reductions for the
winner and its lowest-true-d tie-break, the OpenCV-SGBM uniqueness test,
quadratic sub-pixel refinement, and the O(log D) left-right shear as
VMEM-local lane moves.  It is consumed by the fused bottom-up-sweep +
WTA kernel in ops/pallas/sgm.py (sgm_fused_pallas), which assembles the
4-path sum row by row so no summed volume ever exists in HBM.

Inputs stay in the sweeps' REVERSED-d layout (d' = D-1-d); the indexing
goes through d_true = D-1-d' exactly like stereo._wta/_lr_agreement,
whose integer formulas are reproduced verbatim (bit-parity is tested in
interpret mode against the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INVALID = -32768
_BIG16 = 32767  # int16 max; also the shear fill


def _shift_lanes_left(x, k, fill):
    d, w = x.shape
    if k >= w:
        return jnp.full_like(x, fill)
    pad = jnp.full((d, k), fill, x.dtype)
    return jnp.concatenate([x[:, k:], pad], axis=1)


def _shift_lanes_right(x, k, fill):
    d, w = x.shape
    if k >= w:
        return jnp.full_like(x, fill)
    pad = jnp.full((d, k), fill, x.dtype)
    return jnp.concatenate([pad, x[:, :-k]], axis=1)


def wta_lr_row(s, min_disparity, uniqueness, subpixel, lr_check, real_w):
    """Full WTA/uniqueness/subpixel/LR pipeline on one [D, Wv] int32 row
    plane (reversed-d layout).  Returns the int16 x16 disparity row [Wv].

    Shared by the standalone WTA kernel below and the fused bt+WTA kernel
    in ops/pallas/sgm.py — the integer formulas reproduce stereo._wta /
    _lr_agreement verbatim (bit-parity tested in interpret mode).
    """
    d, wv = s.shape
    nbits = max((min_disparity + d - 1).bit_length(), 1)
    # Padded columns (x >= real_w) must not win the sheared right-view
    # WTA — force them to the shear fill, matching the XLA path's fill
    # beyond the cropped volume.
    xcols = jax.lax.broadcasted_iota(jnp.int32, (1, wv), 1)
    s = jnp.where(xcols < real_w, s, jnp.int32(_BIG16))
    didx = jax.lax.broadcasted_iota(jnp.int32, (d, wv), 0)
    dt = d - 1 - didx  # true disparity index (reversed-d layout)

    key = s * d + dt
    min_key = jnp.min(key, axis=0, keepdims=True)  # [1, Wv]
    best = min_key % d
    min_s = min_key // d

    near = jnp.abs(dt - best) <= 1
    big = jnp.int32(_BIG16)
    second = jnp.min(jnp.where(near, big, s), axis=0, keepdims=True)
    valid = second * (100 - uniqueness) >= min_s * 100

    if subpixel:
        sm = jnp.min(
            jnp.where(dt == best - 1, s, big), axis=0, keepdims=True
        )
        sp = jnp.min(
            jnp.where(dt == best + 1, s, big), axis=0, keepdims=True
        )
        denom2 = jnp.maximum(sm + sp - 2 * min_s, 1)
        delta = ((sm - sp) * 16 + denom2) // (denom2 * 2)
        delta = jnp.where((best > 0) & (best < d - 1), delta, 0)
    else:
        delta = 0

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wv), 1)
    valid = valid & (cols >= best + min_disparity)

    if lr_check:
        # Right-view WTA on the sheared plane, all VMEM-local:
        # sheared[l, x] = s[l, x + d_true(l) + minD].  The shear
        # runs in int16 (values <= 4-path bound 728; fill = int16
        # max) — half the vector registers per shift pass; the
        # keyed reduce upcasts per-element inside the reduction.
        amt = dt + min_disparity  # per-sublane lane shift
        sheared = jnp.minimum(s, jnp.int32(_BIG16)).astype(jnp.int16)
        big16 = jnp.int16(_BIG16)
        for kbit in range(nbits):
            k = 1 << kbit
            sheared = jnp.where(
                (amt & k) != 0,
                _shift_lanes_left(sheared, k, big16),
                sheared,
            )
        key_r = jnp.min(
            sheared.astype(jnp.int32) * d + dt, axis=0, keepdims=True
        )
        best_r = key_r % d  # [1, Wv] right-view winner

        # int8 indicator: quarter the vector registers per unshear pass.
        ind = (jnp.abs(best_r - dt) <= 1).astype(jnp.int8)
        for kbit in range(nbits):
            k = 1 << kbit
            ind = jnp.where(
                (amt & k) != 0,
                _shift_lanes_right(ind, k, jnp.int8(0)),
                ind,
            )
        agree = jnp.max(
            jnp.where(dt == best, ind.astype(jnp.int32), 0),
            axis=0,
            keepdims=True,
        )
        valid = valid & (agree > 0)

    disp16 = (best + min_disparity) * 16 + delta
    return jnp.where(valid, disp16, _INVALID).astype(jnp.int16)[0]

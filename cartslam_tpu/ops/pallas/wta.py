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



def _reduce_sublanes(x, elementwise):
    """Axis-0 reduce (keepdims) that lowers for narrow int dtypes: Mosaic
    implements cross-sublane reduce only for 32-bit types, so int16/int8
    use a halving tree of elementwise combines."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        m = elementwise(x[:half], x[half : 2 * half])
        x = jnp.concatenate([m, x[2 * half :]], axis=0) if n % 2 else m
        n = n - half
    return x


def _min_sublanes(x):
    if x.dtype == jnp.int32:
        return jnp.min(x, axis=0, keepdims=True)
    return _reduce_sublanes(x, jnp.minimum)


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
    """Full WTA/uniqueness/subpixel/LR pipeline on one [D, Wv] row plane
    (reversed-d layout, int16 or int32 — the fused caller feeds int16
    sums, exact for the small-cost regime).  Returns the int16 x16
    disparity row [Wv].

    Consumed by the fused bt+WTA kernel in ops/pallas/sgm.py — the
    integer formulas reproduce stereo._wta / _lr_agreement verbatim
    (bit-parity tested in interpret mode).
    """
    d, wv = s.shape
    nbits = max((min_disparity + d - 1).bit_length(), 1)
    # Padded columns (x >= real_w) must not win the sheared right-view
    # WTA — force them to the shear fill, matching the XLA path's fill
    # beyond the cropped volume.
    xcols = jax.lax.broadcasted_iota(jnp.int32, (1, wv), 1)
    big_s = jnp.asarray(_BIG16, s.dtype)
    s = jnp.where(xcols < real_w, s, big_s)
    didx = jax.lax.broadcasted_iota(jnp.int32, (d, wv), 0)
    dt = d - 1 - didx  # true disparity index (reversed-d layout)
    # Narrow mask iota: comparisons against the winner run at the s
    # width; d - 1 <= 32767 always fits.
    dt_s = dt.astype(s.dtype) if s.dtype != jnp.int32 else dt

    key = s.astype(jnp.int32) * d + dt
    min_key = jnp.min(key, axis=0, keepdims=True)  # [1, Wv]
    best = min_key % d
    min_s = min_key // d
    best_s = best.astype(s.dtype) if s.dtype != jnp.int32 else best

    near = jnp.abs(dt_s - best_s) <= 1
    second = _min_sublanes(jnp.where(near, big_s, s)).astype(jnp.int32)
    valid = second * (100 - uniqueness) >= min_s * 100

    if subpixel:
        sm = _min_sublanes(
            jnp.where(dt_s == best_s - 1, s, big_s)
        ).astype(jnp.int32)
        sp = _min_sublanes(
            jnp.where(dt_s == best_s + 1, s, big_s)
        ).astype(jnp.int32)
        denom2 = jnp.maximum(sm + sp - 2 * min_s, 1)
        delta = ((sm - sp) * 16 + denom2) // (denom2 * 2)
        delta = jnp.where((best > 0) & (best < d - 1), delta, 0)
    else:
        delta = 0

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wv), 1)
    valid = valid & (cols >= best + min_disparity)

    if lr_check:
        # Right-view keyed min over the diagonals S[x + dt + minD, dt] by
        # a HALVING TREE instead of the 9-pass shear: merge the lower
        # half of the sublanes (smaller d' = larger lane shift) into the
        # upper half with a lane shift equal to the half size, log2(D)
        # rounds of geometrically shrinking work (~2 full-plane passes
        # total vs nbits).  Invariant: after reducing to n rows, row i
        # holds min over d' in {i + j*n} of key[d', x + (i + d - n - d')]
        # — anchored at the group's max d'; the final row (anchor
        # d' = d-1, dt = 0) plus a minD lane shift is exactly the
        # sheared-plane keyed min.  Fill keys (1 << 30) exceed every
        # real/padded key (<= _BIG16*d + d-1) and decode to best_r = 0
        # exactly like the shear fill _BIG16 did, so the result is
        # bit-identical everywhere.
        bigkey = jnp.int32(1 << 30)
        cur = key
        n = d
        # Tile alignment: sublane value-slices are only layout-legal at
        # multiples of 8 (one register tile), so the tree stops at n = 8;
        # the last tile gets a 3-pass binary mini-shear (row i shifts
        # left by n-1-i) and a native int32 sublane min.
        while n > 8 and n % 16 == 0:
            half = n // 2
            cur = jnp.minimum(
                cur[half:], _shift_lanes_left(cur[:half], half, bigkey)
            )
            n = half
        if n > 1:
            sub = jax.lax.broadcasted_iota(jnp.int32, (n, wv), 0)
            amt_t = n - 1 - sub
            for kbit in range(max((n - 1).bit_length(), 1)):
                k = 1 << kbit
                cur = jnp.where(
                    (amt_t & k) != 0,
                    _shift_lanes_left(cur, k, bigkey),
                    cur,
                )
            cur = jnp.min(cur, axis=0, keepdims=True)
        key_r = _shift_lanes_left(cur, min_disparity, bigkey)  # [1, Wv]
        best_r = key_r % d  # right-view winner, right coords

        # int8 indicator, unsheared back to left coords (per-sublane
        # constant shifts — the binary decomposition is exact here).
        amt = dt + min_disparity
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

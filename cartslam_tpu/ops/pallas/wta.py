"""Fused SGM winner-take-all + uniqueness + subpixel + LR check, Pallas TPU.

After the four path sweeps, the XLA post-processing (volume adds,
transposes, keyed min-reductions, and the O(log D) left-right shear — each
a full pass over the [H, W, D] volume in HBM) dominates SGM.  This kernel
does ALL of it in one pass: each grid step loads a few rows of the three
summed-path volumes into VMEM and runs the entire WTA/LR pipeline on
[D, W] row planes (sublanes = D, lanes = W), where the shear's
log-decomposed shifts are VMEM-local lane moves instead of HBM passes.

Inputs stay in the sweeps' REVERSED-d layout (d' = D-1-d); the kernel
indexes through d_true = D-1-d' exactly like stereo._wta/_lr_agreement,
whose integer formulas are reproduced verbatim (bit-parity is tested in
interpret mode against the XLA path).

Layouts:
    s_h  [H, D, Wv] int16 — (lr+rl) horizontal sum, transposed by XLA
    s_tb, s_bt [H, D, Wv] int16 — vertical sweeps (native layout)
Output: disparity int16 [H, Wv] in the x16 fixed-point contract.
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


def _make_wta_kernel(
    hb, d, wv, min_disparity, uniqueness, subpixel, lr_check, real_w
):
    def kernel(sh_ref, stb_ref, sbt_ref, out_ref):
        for r in range(hb):
            s = (
                sh_ref[r].astype(jnp.int32)
                + stb_ref[r].astype(jnp.int32)
                + sbt_ref[r].astype(jnp.int32)
            )  # [D, Wv]
            out_ref[0, r] = wta_lr_row(
                s, min_disparity, uniqueness, subpixel, lr_check, real_w
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_disparity", "uniqueness", "subpixel", "lr_check", "interpret",
        "real_w",
    ),
)
def sgm_wta_lr_pallas(
    s_h: jnp.ndarray,
    s_tb: jnp.ndarray,
    s_bt: jnp.ndarray,
    *,
    min_disparity: int,
    uniqueness: int,
    subpixel: bool,
    lr_check: bool,
    real_w: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Volumes [H, D, Wv] int16 (reversed d) -> int16 x16 disparity [H, Wv].

    Caller crops Wv back to the real width.
    """
    h, d, wv = s_h.shape
    if real_w is None:
        real_w = wv
    hb = 8
    while hb > 1 and 3 * hb * d * wv * 2 > 5 * 1024 * 1024:
        hb //= 2
    hpad = -h % hb
    if hpad:
        s_h = jnp.pad(s_h, ((0, hpad), (0, 0), (0, 0)))
        s_tb = jnp.pad(s_tb, ((0, hpad), (0, 0), (0, 0)))
        s_bt = jnp.pad(s_bt, ((0, hpad), (0, 0), (0, 0)))
    hp = h + hpad

    spec = pl.BlockSpec((hb, d, wv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Output written as [nblocks, hb, wv] so the block equals full trailing
    # dims even when hb < 8 (alignment rule), reshaped flat afterwards.
    out = pl.pallas_call(
        _make_wta_kernel(
            hb, d, wv, min_disparity, uniqueness, subpixel, lr_check, real_w
        ),
        grid=(hp // hb,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec(
            (1, hb, wv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp // hb, hb, wv), jnp.int16),
        interpret=interpret,
    )(s_h, s_tb, s_bt)
    return out.reshape(hp, wv)[:h]

"""Bounded backward warps as dense multi-select shifts (no gather).

A per-pixel 2D gather (``img[y - fy, x - fx]``) costs per-index on TPU —
the single most expensive op class in the pipeline.  When the displacement
is bounded (|fy| <= ry, |fx| <= rx), a SINGLE-AXIS per-pixel gather is
exactly a select over the 2r+1 statically shifted copies:

    out[y, x] = sum_d [f[y, x] == d] * img_shifted_by_d[y, x]

(each term a full-bandwidth VPU op; exact, because the mask is evaluated
at the output pixel and there is no shift composition).  A log2
decomposition of the shift does NOT work here — the masks vary along the
shift axis, so power-of-two shifts don't compose (contrast the disparity
shear in ops/stereo.py, whose shift amount is constant along the shifted
axis).

The full 2D warp is then approximated separably: columns first with the
output-pixel flow, rows second —

    out[y, x] ~ img[y - fy[y, x], x - fx[y - fy, x]]

i.e. the horizontal flow is sampled at the source row instead of the
output row.  For the temporal vote chain this is as faithful to the true
backward trajectory as the reference's own approximation (which samples
every flow at the original pixel, planeseg.cu:210-227); equivalence is
metric-gated in tests/test_quality.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_gather_axis(img: jnp.ndarray, f: jnp.ndarray, r: int, axis: int,
                       fill):
    """Exact per-pixel single-axis gather: out[p] = img[p - f[p] * e_axis].

    f int32, clamped mask-wise to [-r, r]; out-of-range f or out-of-image
    sources produce `fill`.
    """
    size = img.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, f.shape, axis)
    src = pos - f
    valid = (src >= 0) & (src < size) & (f >= -r) & (f <= r)
    out = jnp.full_like(img, fill)
    # |d| >= size can never produce an in-image source — the valid mask
    # already yields `fill` there, so those shifts are skipped (they would
    # otherwise build over-sized pads at coarse pyramid levels).
    for d in range(max(-r, -(size - 1)), min(r, size - 1) + 1):
        # shifted[p] = img[p - d] along axis: pad d at the front (d>0).
        if d >= 0:
            pads = [(0, 0)] * img.ndim
            pads[axis] = (d, 0)
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(0, size - d) if d else slice(None)
            shifted = jnp.pad(img[tuple(sl)], pads, constant_values=fill)
        else:
            pads = [(0, 0)] * img.ndim
            pads[axis] = (0, -d)
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(-d, size)
            shifted = jnp.pad(img[tuple(sl)], pads, constant_values=fill)
        out = jnp.where(f == d, shifted, out)
    return jnp.where(valid, out, fill)


def select_warp_clamped(img: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray,
                        ry: int, rx: int):
    """Backward warp with edge-clamped sampling (matches coordinate-clamp
    gather semantics): out[y, x] = img[clip(y - fy), clip(x - fx)].

    Displacements must satisfy |fy| <= ry, |fx| <= rx; the clamped
    effective displacement provably stays within the same bounds.
    Separable approximation as in `separable_warp`.
    """
    h, w = img.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.int32, fy.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, fx.shape, 1)
    fyc = ys - jnp.clip(ys - jnp.clip(fy, -ry, ry), 0, h - 1)
    fxc = xs - jnp.clip(xs - jnp.clip(fx, -rx, rx), 0, w - 1)
    csel = select_gather_axis(img, fxc, rx, axis=1, fill=0)
    return select_gather_axis(csel, fyc, ry, axis=0, fill=0)


def separable_warp(img: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray,
                   ry: int, rx: int, fill):
    """Backward 2D warp img[y - fy, x - fx] via two exact 1-axis passes.

    Column pass uses fx at the source row (see module docstring).  Returns
    (warped, valid) where valid marks in-image, in-range displacements.
    """
    h, w = img.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.int32, fy.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, fx.shape, 1)
    valid = (
        ((ys - fy) >= 0) & ((ys - fy) < h) & ((xs - fx) >= 0)
        & ((xs - fx) < w) & (fy >= -ry) & (fy <= ry)
        & (fx >= -rx) & (fx <= rx)
    )
    csel = select_gather_axis(img, fx, rx, axis=1, fill=fill)
    out = select_gather_axis(csel, fy, ry, axis=0, fill=fill)
    return jnp.where(valid, out, fill), valid

"""Disparity directional derivatives + histograms.

Two variants, mirroring the reference:

1. `directional_derivatives` — the ImageDisparityDerivative module
   (src/modules/disparity/derivative.cu:27-116): central differences at
   offset +-2 in both directions, 2-channel output, and a per-channel
   256-bin histogram of values in [-128, 127].

2. `planeseg_derivative` — the pixel plane-segmentation module's private
   derivative (src/modules/planeseg/planeseg.cu:31-158): a vertical 5-tap
   sliding valid-mean low-pass prefilter, then a vertical central
   difference at offset +-1, 1-channel output + 256-bin histogram.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DISPARITY_INVALID = -32768
DERIVATIVE_INVALID = -32768


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """out[y, x] = in[y + dy, x + dx], out-of-bounds -> fill."""
    h, w = x.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    xp = jnp.pad(x, ((py1, py0), (px1, px0)), constant_values=fill)
    return jax.lax.dynamic_slice(xp, (py1 + dy, px1 + dx), (h, w))


def _hist256(values: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """int32[256] histogram of `values` in [-128, 127] where valid.

    Two-level one-hot MXU reduction: hist[b] = sum_p [hi(idx_p)==hi(b)] *
    [lo(idx_p)==lo(b)] with 4-bit halves, i.e. ONE [16, B] @ [B, 16] matmul
    whose (hi, lo) entry is bin hi*16+lo.  Exact: products are 0/1 in bf16
    and the f32 accumulation is an integer < 2^24.  Replaces the blocked
    [B, 256] dense one-hot sweep, whose per-block one-hots were
    materialized in HBM (~1 GB/frame at KITTI geometry)."""
    v = values.astype(jnp.int32)
    in_range = valid & (v >= -128) & (v <= 127)
    idx = jnp.where(in_range, v + 128, 256)  # out-of-range -> dropped
    flat = idx.reshape(-1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
    # Dropped bin 256 has hi = 16, outside the 0..15 lanes -> all-zero row.
    ohhi = ((flat[:, None] >> 4) == lanes).astype(jnp.bfloat16)
    ohlo = ((flat[:, None] & 15) == lanes).astype(jnp.bfloat16)
    m = jnp.dot(ohhi.T, ohlo, preferred_element_type=jnp.float32)
    return m.reshape(256).astype(jnp.int32)


@jax.jit
def directional_derivatives(disparity: jnp.ndarray):
    """int16 disparity [H,W] -> (derivatives int16 [H,W,2], hist int32 [256,2]).

    Channel 0 = vertical derivative, channel 1 = horizontal, both at offset
    +-2 (derivative.cu:20,61-76).  The derivative subtraction itself uses the
    raw (possibly invalid) samples; validity only gates the output value and
    histogram, matching the reference kernel exactly.
    """
    d = disparity.astype(jnp.int32)
    off = 2

    # The CUDA kernel reads a shared tile whose halo is edge-extrapolated by
    # copyToShared (include/utils/cuda.cuh:59-191): out-of-image samples
    # clamp to the border pixel — including its validity.
    up = _clamped_shift(d, -off, 0)
    dn = _clamped_shift(d, off, 0)
    lf = _clamped_shift(d, 0, -off)
    rt = _clamped_shift(d, 0, off)

    # int16 wrap-around of the subtraction, as in the CUDA kernel.
    vert = ((dn - up + 32768) % 65536 - 32768).astype(jnp.int32)
    horz = ((rt - lf + 32768) % 65536 - 32768).astype(jnp.int32)

    vert_valid = (up != DISPARITY_INVALID) & (dn != DISPARITY_INVALID)
    horz_valid = (lf != DISPARITY_INVALID) & (rt != DISPARITY_INVALID)

    out_v = jnp.where(vert_valid, vert, DERIVATIVE_INVALID).astype(jnp.int16)
    out_h = jnp.where(horz_valid, horz, DERIVATIVE_INVALID).astype(jnp.int16)

    hist_v = _hist256(vert, vert_valid)
    hist_h = _hist256(horz, horz_valid)

    return (
        jnp.stack([out_v, out_h], axis=-1),
        jnp.stack([hist_v, hist_h], axis=-1),
    )


def _clamped_shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    h, w = x.shape
    py, px = abs(dy), abs(dx)
    xp = jnp.pad(x, ((py, py), (px, px)), mode="edge")
    return jax.lax.dynamic_slice(xp, (py + dy, px + dx), (h, w))


@jax.jit
def planeseg_derivative(disparity: jnp.ndarray):
    """Pixel-planeseg derivative: low-pass + vertical diff -> (deriv, hist).

    Mirrors calculateDerivatives (planeseg.cu:31-142): a vertical sliding
    window mean over [-2, +2) of valid samples replaces each pixel (invalid
    if no valid sample in the window), then derivative = smoothed[y+1] -
    smoothed[y-1], valid when smoothed center/up/down are all valid.
    """
    d = disparity.astype(jnp.int32)

    # Vertical 5-tap [-2, +2] valid mean (sliding-window sum in the kernel).
    # Halo samples clamp at image borders (copyToShared extrapolation).
    taps = [_clamped_shift(d, k, 0) for k in (-2, -1, 0, 1, 2)]
    valid_taps = [t != DISPARITY_INVALID for t in taps]
    s = sum(jnp.where(v, t, 0) for t, v in zip(taps, valid_taps))
    n = sum(v.astype(jnp.int32) for v in valid_taps)
    # C++ `sum / count` truncates toward zero (sums may be negative only for
    # garbage inputs; disparities are >= 0 when valid).
    smoothed = jnp.where(n > 0, s // jnp.maximum(n, 1), DISPARITY_INVALID)

    up = _clamped_shift(smoothed, -1, 0)
    dn = _clamped_shift(smoothed, 1, 0)

    deriv = dn - up
    valid = (
        (smoothed != DISPARITY_INVALID)
        & (up != DISPARITY_INVALID)
        & (dn != DISPARITY_INVALID)
    )
    out = jnp.where(valid, deriv, DERIVATIVE_INVALID).astype(jnp.int16)
    hist = _hist256(deriv, valid)
    return out, hist

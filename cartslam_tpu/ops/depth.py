"""Disparity -> 3D reprojection via the OpenCV Q matrix.

Mirrors DepthModule (src/modules/depth.cpp:9-25): disparity int16 / 16.0 ->
float, then cv::cuda::reprojectImageTo3D with the source's Q matrix to a
3-channel XYZ image.  Like the reference, invalid disparities (-32768/16)
are fed through the same math (no special-casing), producing the same
near-camera artifacts that downstream z-range filters discard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def reproject_to_3d(
    disparity: jnp.ndarray, q: jnp.ndarray, row_offset=0
) -> jnp.ndarray:
    """int16 x16 disparity [H,W] + Q float32 [4,4] -> XYZ float32 [H,W,3].

    [X Y Z W]^T = Q @ [x, y, disp, 1]^T ; output = (X/W, Y/W, Z/W).
    row_offset: global row of the first local row (height-sharded mode).
    """
    h, w = disparity.shape
    d = disparity.astype(jnp.float32) / 16.0
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + row_offset
    ones = jnp.ones((h, w), jnp.float32)
    vec = jnp.stack([xs, ys, d, ones], axis=-1)  # [H, W, 4]
    out = jnp.einsum("ij,hwj->hwi", q.astype(jnp.float32), vec)
    ww = out[..., 3:4]
    return out[..., :3] / ww

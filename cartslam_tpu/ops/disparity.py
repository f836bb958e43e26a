"""Disparity post-processing: iterative hole-filling interpolation.

Re-design of the reference's shared-memory interpolation kernel
(src/modules/disparity/interpolation.cu:17-99): per iteration, every pixel is
replaced by the mean of the valid values in its (2r-1)^2 window when more
than r^2+1 of them are valid, else marked invalid.  The reference runs the
iterations inside one CUDA block tile (so tiles interact only through stale
halos); here every iteration is a dense synchronous pass, which is the
natural XLA formulation and only differs at tile borders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DISPARITY_INVALID = -32768


def _box_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sum over the (2r-1)x(2r-1) window centered at each pixel.

    Edge padding mirrors copyToShared's border extrapolation — out-of-image
    neighbors clamp to the border pixel (value and validity alike).
    """
    k = 2 * r - 1
    if r <= 4:
        # Direct separable shift-adds: TPU cumsum is a log-depth shift
        # chain, so for the small windows the reference uses (radius <= 4)
        # 2(k-1) adds are cheaper and fuse with the surrounding arithmetic.
        h, w = x.shape
        xp = jnp.pad(x, ((r - 1, r - 1), (r - 1, r - 1)), mode="edge")
        rows = sum(
            jax.lax.dynamic_slice(xp, (i, 0), (h, w + 2 * (r - 1)))
            for i in range(k)
        )
        return sum(
            jax.lax.dynamic_slice(rows, (0, j), (h, w)) for j in range(k)
        )
    # Two separable cumulative passes keep this O(HW) regardless of radius.
    xp = jnp.pad(x, ((r - 1, r - 1), (r - 1, r - 1)), mode="edge")
    c = jnp.cumsum(xp, axis=0)
    c = jnp.pad(c, ((1, 0), (0, 0)))
    rows = c[k:, :] - c[:-k, :]
    c2 = jnp.cumsum(rows, axis=1)
    c2 = jnp.pad(c2, ((0, 0), (1, 0)))
    return c2[:, k:] - c2[:, :-k]


@functools.partial(
    jax.jit, static_argnames=("radius", "iterations", "min_disparity", "max_disparity")
)
def interpolate(
    disparity: jnp.ndarray,
    *,
    radius: int,
    iterations: int,
    min_disparity: int,
    max_disparity: int,
) -> jnp.ndarray:
    """Iterative neighborhood-average smoothing/hole-filling.

    `disparity` is int16 x16 fixed point; validity = value in
    (min_disparity, max_disparity) exclusive, mirroring
    interpolation.cu:49-53 (min is x16, max is image width).
    """
    min_count = radius * radius + 1

    def body(_, disp):
        d = disp.astype(jnp.int32)
        valid = (d > min_disparity) & (d < max_disparity)
        vals = jnp.where(valid, d, 0)
        s = _box_sum(vals, radius)
        n = _box_sum(valid.astype(jnp.int32), radius)
        # C++ integer division of non-negative sums truncates = floor here.
        avg = s // jnp.maximum(n, 1)
        out = jnp.where(n > min_count, avg, DISPARITY_INVALID)
        return out.astype(jnp.int16)

    return jax.lax.fori_loop(0, iterations, body, disparity)

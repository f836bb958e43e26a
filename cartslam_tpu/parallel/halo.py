"""Row-halo exchange over a 1-D mesh axis.

The spatial latency mode's replacement for the reference's CUDA
shared-memory tile aprons (include/utils/cuda.cuh:59-191): neighbor rows
move over ICI with `ppermute`, and global image edges are filled with the
consuming op's own border convention (edge clamp or a constant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exchange_row_halo(x, up: int, down: int, axis_name: str, fill="edge"):
    """Extend a row shard [H_local, ...] with neighbor rows over the mesh.

    fill: 'edge' duplicates the border row at the global image edges (the
    stencil ops' clamp convention); a scalar fills them with a constant.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    parts = []
    if up:
        from_above = jax.lax.ppermute(
            x[-up:], axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        if fill == "edge":
            edge = jnp.repeat(x[:1], up, axis=0)
        else:
            edge = jnp.full((up, *x.shape[1:]), fill, x.dtype)
        parts.append(jnp.where(idx == 0, edge, from_above))
    parts.append(x)
    if down:
        from_below = jax.lax.ppermute(
            x[:down], axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        if fill == "edge":
            edge = jnp.repeat(x[-1:], down, axis=0)
        else:
            edge = jnp.full((down, *x.shape[1:]), fill, x.dtype)
        parts.append(jnp.where(idx == n - 1, edge, from_below))
    return jnp.concatenate(parts, axis=0)

"""Spatial (width-sharded) processing with ICI halo exchange.

The reference is single-GPU; its stencil kernels read shared-memory halos
(include/utils/cuda.cuh:59-191).  Across a TPU mesh the same pattern
becomes: shard the image width over a 'spatial' axis, exchange `halo`
boundary columns with ring neighbors via `ppermute`, apply the dense stencil
op on the locally-extended shard, crop.  Global reductions (histograms)
finish with a `psum` over the axis.

Used by the multi-chip dry run and the multi-sequence scale-out path for
derivative/interpolation/classification stages; SGM's horizontal scans are
sequential in W and stay chip-local (each chip runs whole rows of its
sequence batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import derivative as dops
from ..ops import planeseg as pops


def exchange_width_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend a width shard [..., W_local, ...] (axis=1) with neighbor columns.

    Edge shards duplicate their border (copyToShared edge extrapolation at
    the true image boundary); interior seams receive real neighbor data.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    left_edge = x[:, :halo]
    right_edge = x[:, -halo:]
    # Send my right edge to my right neighbor (it becomes their left halo).
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # Wrap-around results at the global edges are replaced by edge clamping.
    edge_l = jnp.repeat(x[:, :1], halo, axis=1)
    edge_r = jnp.repeat(x[:, -1:], halo, axis=1)
    left = jnp.where(idx == 0, edge_l, from_left)
    right = jnp.where(idx == n - 1, edge_r, from_right)
    return jnp.concatenate([left, x, right], axis=1)


def sharded_derivative(mesh: Mesh, axis: str = "spatial"):
    """Width-sharded directional_derivatives: [H, W] int16 sharded on W ->
    (derivatives sharded, histogram replicated via psum)."""

    def local_exact(d_shard):
        ext = exchange_width_halo(d_shard, 2, axis)
        deriv_ext, _ = dops.directional_derivatives(ext)
        deriv = deriv_ext[:, 2:-2]
        hist = jnp.stack(
            [
                dops._hist256(deriv[..., 0].astype(jnp.int32), deriv[..., 0] != -32768),
                dops._hist256(deriv[..., 1].astype(jnp.int32), deriv[..., 1] != -32768),
            ],
            axis=-1,
        )
        return deriv, jax.lax.psum(hist, axis)

    return jax.jit(
        jax.shard_map(
            local_exact,
            mesh=mesh,
            in_specs=P(None, axis),
            out_specs=(P(None, axis), P()),
        )
    )


def sharded_interpolate(
    mesh: Mesh,
    axis: str = "spatial",
    *,
    radius: int,
    iterations: int,
    min_disparity: int,
    max_disparity: int,
):
    """Width-sharded disparity interpolation with per-iteration halo
    exchange (halo = radius - 1 columns each side, the stencil's reach)."""
    from ..ops import disparity as dsp

    halo = radius - 1

    def local(d_shard):
        def body(_, d):
            ext = exchange_width_halo(d, halo, axis) if halo else d
            out = dsp.interpolate(
                ext, radius=radius, iterations=1,
                min_disparity=min_disparity, max_disparity=max_disparity,
            )
            return out[:, halo : out.shape[1] - halo]

        return jax.lax.fori_loop(0, iterations, body, d_shard)

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, axis)
        )
    )


def sharded_classify(mesh: Mesh, axis: str = "spatial"):
    """Width-sharded plane classification (pointwise — no halo needed)."""

    def local(deriv_shard, ranges):
        return pops.classify(deriv_shard, ranges)

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P(None, axis), P()), out_specs=P(None, axis)
        )
    )

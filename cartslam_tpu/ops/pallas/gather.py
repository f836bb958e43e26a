"""Pallas TPU table-gather: out[r, p] = table[r, labels[p]].

XLA lowers `jnp.take(table, labels, axis=1)` on TPU to a generic gather
running at ~3 G elem/s — it dominates the superpixel relaxation (the
per-label statistics lookup is most of each sweep).  Mosaic, however, has a
native `tpu.dynamic_gather` for take_along_axis-shaped accesses:

    out[i, j] = x[idx[i, j], j]        (same 2D shape for x / idx / out)

The trick: lane-broadcast one table row to [Lp, 128] so every lane holds
the full table along sublanes, then a sublane dynamic_gather with a
[Lp, 128] block of pixel indices looks up 128 pixels per cycle burst.
Each grid step handles one (pixel-block, table-row) pair; pixel blocks are
forced to Lp x 128 elements by the same-shape constraint.

Used for any small-table lookup (per-label stats, per-label paint);
requires L to fit VMEM twice (~<= 64k rows), which superpixel label counts
satisfy by construction (uint16 labels in the reference, constants.hpp:37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _gather_kernel(table_ref, idx_ref, out_ref):
    row = table_ref[0, 0, :]  # [Lp]
    x = jnp.broadcast_to(row[:, None], idx_ref.shape[1:])  # [Lp, 128]
    out_ref[0, 0] = jnp.take_along_axis(x, idx_ref[0], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def table_gather(table: jnp.ndarray, labels: jnp.ndarray, *, interpret=False):
    """table [R, L] (any 4-byte dtype), labels int32 [...] -> [R, *labels.shape].

    Values of `labels` must lie in [0, L).
    """
    r, l = table.shape
    lp = _round_up(max(l, 8), 8)
    n = labels.size
    blk = lp * 128
    nblk = -(-n // blk)
    npad = nblk * blk

    tpad = jnp.pad(table, ((0, 0), (0, lp - l)))[:, None, :]  # [R, 1, Lp]
    idx = jnp.pad(labels.reshape(-1), (0, npad - n)).astype(jnp.int32)
    idx = idx.reshape(nblk, lp, 128)

    out = pl.pallas_call(
        _gather_kernel,
        grid=(nblk, r),
        in_specs=[
            pl.BlockSpec(
                (1, 1, lp), lambda b, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, lp, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, lp, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblk, r, lp, 128), table.dtype),
        interpret=interpret,
    )(tpad, idx)

    out = out.transpose(1, 0, 2, 3).reshape(r, npad)[:, :n]
    return out.reshape((r, *labels.shape))

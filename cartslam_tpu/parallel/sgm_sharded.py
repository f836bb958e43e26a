"""Exact height-sharded SGM: bit-equal to the full-frame op for any shard
count.

Replaces the r3 spatial mode's vertical-sweep warmup apron (a 24-row
halo whose seams were only "numerically invisible") with a split-scan
carry hand-off.  The SGM vertical recurrence (ops/stereo.sgm_scan_step)
is min-plus linear in its carry, so a sweep seeded with the TRUE final
carry of the predecessor shard is an exact continuation of the
full-frame scan.  Shard 0's top-down sweep is exact by construction; a
sequential chain of `ppermute` hops of the tiny [W, D] carry then makes
each following shard exact in turn (and symmetrically bottom-up).

Cost model: the chain runs n_local sweeps sequentially, so the vertical
passes stay at full-frame latency while everything else in the step
(census, cost volume, horizontal sweeps, WTA, LR) scales with the shard
count — the unavoidable serialization of a row recurrence, bought for
bit-exactness.  The intermediate sweeps live inside a `fori_loop` so the
unrolled chain costs one scan body to compile regardless of mesh size.

reference: the path aggregation this reproduces is the per-direction
cost recurrence of src/modules/disparity/disparity.cu:49-80 (OpenCV
CUDA SGM); seam-exactness has no reference analogue (single-GPU tiles
share an L2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import stereo
from .halo import exchange_row_halo

_CENSUS_HALO = stereo.CENSUS_HT // 2  # 3 rows for the 9x7 window


def _vertical_chain(cost_hwd, axis_name: str, p1: int, p2: int,
                    reverse: bool):
    """Exact vertical path aggregation [h_local, W, D] across shards.

    Sequential over shards: n-1 carry-settling sweeps (ys unused, DCE'd
    down to the recurrence) then one output sweep from the settled carry.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    step = stereo.sgm_scan_step(p1, p2)
    xs = cost_hwd[::-1] if reverse else cost_hwd
    zero = xs[0].astype(jnp.int32) * 0  # [W, D], inherits varying type
    if reverse:
        perm = [(i, i - 1) for i in range(1, n)]
        edge = n - 1
    else:
        perm = [(i, i + 1) for i in range(n - 1)]
        edge = 0

    def settle(_, carry):
        fin, _ys = jax.lax.scan(step, carry, xs)
        recv = jax.lax.ppermute(fin, axis_name, perm)
        return jnp.where(idx == edge, zero, recv)

    # Invariant: after j settling hops, shards 0..j (resp. n-1-j..n-1)
    # hold their exact predecessor carry; n-1 hops settle all of them.
    carry = jax.lax.fori_loop(0, n - 1, settle, zero)
    _, out = jax.lax.scan(step, carry, xs, unroll=8)
    return out[::-1] if reverse else out


def sgm_disparity_sharded(
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    axis_name: str,
    *,
    min_disparity: int = 4,
    num_disparities: int = 256,
    p1: int = 10,
    p2: int = 120,
    uniqueness: int = 12,
    lr_check: bool = True,
    subpixel: bool = True,
    backend: str = "auto",
) -> jnp.ndarray:
    """`stereo.sgm_disparity` on row shards, bit-equal to the full frame.

    Inputs are [H_local, W] row shards inside a shard_map over
    `axis_name`.  Census sees true neighbor rows through a 3-row halo;
    the cost volume, horizontal sweeps, WTA, uniqueness and LR check are
    row-local (exact); the two vertical sweeps run the carry hand-off
    chain of `_vertical_chain`.

    backend: 'auto' routes to the fused Pallas kernels on TPU (the
    split-scan chain seeds their carries — ops/pallas/sgm.py::
    sgm_fused_pallas_sharded) and the XLA scans elsewhere;
    'pallas_interpret' runs the kernels interpreted (parity tests).
    """
    hc = _CENSUS_HALO
    gl_ext = exchange_row_halo(gray_l, hc, hc, axis_name)
    gr_ext = exchange_row_halo(gray_r, hc, hc, axis_name)
    cl = tuple(c[hc:-hc] for c in stereo.census_transform(gl_ext))
    cr = tuple(c[hc:-hc] for c in stereo.census_transform(gr_ext))

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend in ("pallas", "pallas_interpret"):
        from ..ops.pallas.sgm import sgm_fused_pallas_sharded

        return sgm_fused_pallas_sharded(
            cl, cr, axis_name=axis_name,
            min_disparity=min_disparity,
            num_disparities=num_disparities,
            p1=p1, p2=p2, uniqueness=uniqueness,
            subpixel=subpixel, lr_check=lr_check,
            interpret=backend == "pallas_interpret",
        )

    cost = stereo.hamming_cost_volume(cl, cr, min_disparity, num_disparities)
    h, w = gray_l.shape
    chwd = jnp.transpose(cost, (1, 2, 0))  # [h, W, D]

    # Horizontal paths: scan over W, rows independent — exact per shard.
    cw = jnp.transpose(chwd, (1, 0, 2))  # [W, h, D]
    lr = stereo._aggregate_scan(cw, p1, p2)
    rl = stereo._aggregate_scan(cw[::-1], p1, p2)[::-1]
    s = jnp.transpose(lr + rl, (1, 0, 2))  # [h, W, D]

    # Vertical paths: exact split-scan chains.
    s = s + _vertical_chain(chwd, axis_name, p1, p2, reverse=False)
    s = s + _vertical_chain(chwd, axis_name, p1, p2, reverse=True)

    disp16, best, valid = stereo._wta(s, min_disparity, uniqueness, subpixel)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = valid & (cols >= best + min_disparity)
    if lr_check:
        valid = valid & stereo._lr_agreement(s, best, min_disparity, False)
    out = jnp.where(valid, disp16, stereo.DISPARITY_INVALID)
    return out.astype(jnp.int16)

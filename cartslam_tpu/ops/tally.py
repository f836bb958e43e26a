"""Two-level one-hot MXU reductions: per-label tallies and table gathers.

TPU scatters and gathers cost per-index; the round-2 answer was blocked
one-hot matmuls, but a [B, L] one-hot at L ~ 3.3k labels is 1.5G VPU
comparisons per tally and the blocked `lax.map` form materialized every
block's one-hot in HBM (GBs of traffic per frame).

The fix is index decomposition: split the label l = hi * nlo + lo so a
tally needs only the two small one-hots,

    T[c][hi, lo] = sum_b  v_c[b] * ohhi[b, hi] * ohlo[b, lo]
                 = (kr(v, ohhi).T @ ohlo)[c * nhi + hi, lo],

(kr = per-row Khatri-Rao product) and a table gather becomes matmul +
row-reduce,

    out[b] = table2d[hi_b, lo_b] = sum_lo ohlo[b, lo] * (ohhi @ T2d)[b, lo].

The MXU MAC count is unchanged (B * L * C either way — tiny); the VPU
one-hot build drops from B * L to B * (C * nhi + nlo), minimized by
nlo ~ sqrt(C * L).

Exactness: all operands are 0/1 or integers <= 255 (bf16-exact); products
are exact integers and the f32 accumulation stays exact below 2^24 per
output element — the same bound the f32 scatter it replaces has.

Used by ops/planeseg.superpixel_vote and ops/superpixels.init_stats; the
derivative histograms (ops/derivative._hist256) inline the 16x16 variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_tally(
    labels: jnp.ndarray,
    values: jnp.ndarray,
    num_labels: int,
    *,
    block: int = 16384,
) -> jnp.ndarray:
    """Per-label sums: out[l, c] = sum_{p: labels[p]=l} values[p, c].

    labels: int [B] in [0, num_labels); values: [B, C], entries must be
    bf16-exact (integers with |v| <= 256).  Returns f32 [num_labels, C],
    exact while per-label column sums stay below 2^24.

    Blocked (lax.map) so the per-block Khatri-Rao operand stays small; the
    lo-side width is chosen ~ sqrt(C * L) to balance the two VPU one-hot
    builds.
    """
    b, c = values.shape
    if jax.default_backend() == "tpu" and c >= 16:
        # The Pallas kernel's Khatri-Rao repeat works on 128-lane-padded
        # tiles, so it only pays off for wide value matrices (the moment
        # tally, C=50); narrow tallies (vote counts, C=3) stay on the
        # XLA path, whose per-block operands are small enough anyway.
        from .pallas.tally import label_tally_pallas

        return label_tally_pallas(labels, values, num_labels)
    # nlo must be a power of two for the bit split; >= 128 keeps lanes full.
    nlo = 128
    while nlo < 1024 and nlo * nlo < c * num_labels:
        nlo *= 2
    nhi = -(-num_labels // nlo)
    lanes_lo = jax.lax.broadcasted_iota(jnp.int32, (1, nlo), 1)
    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (1, nhi), 1)

    nb = -(-b // block)
    lab_p = jnp.pad(
        labels.astype(jnp.int32).reshape(-1), (0, nb * block - b),
        constant_values=nhi * nlo,  # sentinel: all-zero ohhi row
    )
    v_p = jnp.pad(values.astype(jnp.bfloat16), ((0, nb * block - b), (0, 0)))

    def blk_fn(args):
        lb, vb = args
        ohlo = ((lb[:, None] & (nlo - 1)) == lanes_lo).astype(jnp.bfloat16)
        ohhi = ((lb[:, None] >> (nlo.bit_length() - 1)) == lanes_hi).astype(
            jnp.bfloat16
        )
        kr = (vb[:, :, None] * ohhi[:, None, :]).reshape(block, c * nhi)
        return jnp.dot(kr.T, ohlo, preferred_element_type=jnp.float32)

    t = jnp.sum(
        jax.lax.map(blk_fn, (lab_p.reshape(nb, block),
                             v_p.reshape(nb, block, c))),
        axis=0,
    )  # [C * nhi, nlo]
    return t.reshape(c, nhi * nlo)[:, :num_labels].T


def table_gather(table: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """out[...] = table[labels[...]] for small-integer tables.

    table: [L] with bf16-exact entries (integers, |v| <= 256); labels: int
    array of any shape with values in [0, L).  Runs as matmul + row-reduce
    instead of a per-index gather.  Returns int32, shape of `labels`.
    """
    (l,) = table.shape
    shape = labels.shape
    idx = labels.reshape(-1).astype(jnp.int32)
    nhi = -(-l // 64)
    lanes_lo = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (1, nhi), 1)
    ohlo = ((idx[:, None] & 63) == lanes_lo).astype(jnp.float32)
    ohhi = ((idx[:, None] >> 6) == lanes_hi).astype(jnp.bfloat16)
    t2d = jnp.pad(table.astype(jnp.bfloat16), (0, nhi * 64 - l)).reshape(
        nhi, 64
    )
    g = jnp.dot(ohhi, t2d, preferred_element_type=jnp.float32)  # [B, 64]
    out = jnp.sum(g * ohlo, axis=1)
    return out.astype(jnp.int32).reshape(shape)

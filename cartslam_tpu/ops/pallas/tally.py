"""Two-level one-hot label tally as a Pallas TPU kernel.

The XLA form (ops/tally.py::label_tally) blocks with lax.map, which
materializes every block's Khatri-Rao operand and lo-one-hot in HBM
(~0.8 GB/frame for the superpixel moment tally).  This kernel builds both
in VMEM and accumulates the [C * nhi, nlo] product on-chip, so HBM sees
only the labels and value columns once.

Same exactness contract as ops/tally.py: all products are bf16-exact
integers, f32 accumulation exact below 2^24 per output element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _make_tally_kernel(blk, c, nhi, nlo, nb):
    shift = nlo.bit_length() - 1

    def kernel(lab_ref, rhs_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros((c * nhi, nlo), jnp.float32)

        lab = lab_ref[...]  # [blk, 1] int32
        lanes_lo = jax.lax.broadcasted_iota(jnp.int32, (1, nlo), 1)
        ohlo = ((lab & (nlo - 1)) == lanes_lo).astype(jnp.bfloat16)
        v = rhs_ref[...]  # [blk, c] bf16
        # Khatri-Rao without 3D broadcasts (Mosaic can't insert a minor
        # dim on 16-bit types): pltpu.repeat TILES the value columns nhi
        # times (hi-major: lane h*c + c_idx holds v[c_idx]) and the
        # hi-one-hot mask comes from ONE iota compare.
        v_rep = pltpu.repeat(v, nhi, axis=1)  # [blk, nhi * c]
        lanes_kr = jax.lax.broadcasted_iota(jnp.int32, (1, c * nhi), 1)
        mask = (lab >> shift) == (lanes_kr // c)
        kr = jnp.where(mask, v_rep, jnp.bfloat16(0))
        acc[...] += jax.lax.dot_general(
            kr, ohlo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == nb - 1)
        def _():
            out_ref[...] = acc[...]

    return kernel


def _make_vote_kernel(blk, npl, nhi, nlo, nb):
    shift = nlo.bit_length() - 1
    rows = nhi * npl

    def kernel(lab_ref, vote_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros((rows, nlo), jnp.float32)

        # Inputs arrive as [1, 1, blk] rows (a [blk, 1] block would pad
        # its lane dim 1 -> 128 and blow VMEM 128x; a 2-D (1, blk) block
        # violates the 8-sublane tiling rule); the one-hots are built
        # TRANSPOSED so every op keeps blk on the lane axis.
        lab = lab_ref[0]  # [1, blk] int32
        vote = vote_ref[0]  # [1, blk] int32
        sub_lo = jax.lax.broadcasted_iota(jnp.int32, (nlo, 1), 0)
        ohlo_t = ((lab & (nlo - 1)) == sub_lo).astype(jnp.bfloat16)
        # Row hi*npl + p: indicator (hi(lab)==hi) & (vote==p) — a pure
        # compare against two iota-derived row codes, no Khatri-Rao
        # materialization at all.
        sub_r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        mask = ((lab >> shift) == (sub_r // npl)) & (vote == sub_r % npl)
        kr_t = mask.astype(jnp.bfloat16)
        acc[...] += jax.lax.dot_general(
            kr_t, ohlo_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == nb - 1)
        def _():
            out_ref[...] = acc[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_labels", "num_classes", "block",
                              "interpret")
)
def vote_tally_pallas(
    labels: jnp.ndarray,
    votes: jnp.ndarray,
    num_labels: int,
    num_classes: int,
    *,
    block: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-label class counts: out[l, p] = #{pixels: label=l, vote=p}.

    labels int [B]; votes int [B] in [0, num_classes).  Exact f32 integer
    counts.  The tiny class count makes the one-hot rows a single iota
    compare, so the whole tally is VMEM-resident compares + one small
    matmul per block.
    """
    (b,) = votes.reshape(-1).shape
    nlo = 128
    while nlo < 1024 and nlo * nlo < num_classes * num_labels:
        nlo *= 2
    nhi = -(-num_labels // nlo)
    nb = -(-b // block)
    lab_p = jnp.pad(
        labels.astype(jnp.int32).reshape(-1), (0, nb * block - b),
        constant_values=nhi * nlo,
    ).reshape(nb, 1, block)
    vote_p = jnp.pad(
        votes.astype(jnp.int32).reshape(-1), (0, nb * block - b),
        constant_values=num_classes,  # matches no class row
    ).reshape(nb, 1, block)

    rows = nhi * num_classes
    t = pl.pallas_call(
        _make_vote_kernel(block, num_classes, nhi, nlo, nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, nlo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, nlo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, nlo), jnp.float32)],
        interpret=interpret,
    )(lab_p, vote_p)
    # t[hi*npl + p, lo] -> out[l = hi*nlo + lo, p]
    out = (
        t.reshape(nhi, num_classes, nlo)
        .transpose(1, 0, 2)
        .reshape(num_classes, nhi * nlo)
    )
    return out[:, :num_labels].T


def _channel_plan(bounds):
    """Static per-channel byte-plane plan from value bounds.

    For (lo, hi): sums are tallied on (v + off) byte planes with
    off = max(0, -lo) (so they are non-negative), squares on raw v*v
    (non-negative always); each uses exactly the bytes its maximum
    needs.  int16-range channels cost 2 + 4 rows; a uint8 image channel
    only 1 + 2 — nearly halving the tally matmul's row count for the
    superpixel feature stack.
    """
    plan = []
    for lo, hi in bounds:
        lo, hi = int(lo), int(hi)
        off = -lo if lo < 0 else 0
        nsb = max(1, ((hi + off).bit_length() + 7) // 8)
        nqb = max(1, (max(lo * lo, hi * hi).bit_length() + 7) // 8)
        plan.append((off, nsb, nqb))
    return tuple(plan)


def _make_moment_kernel(blk, nhi, nlo, nb, plan):
    shift = nlo.bit_length() - 1
    nplanes = sum(nsb + nqb for _, nsb, nqb in plan)
    nrows = nplanes * nhi + nhi

    def kernel(lab_ref, d_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros((nrows, nlo), jnp.float32)

        lab = lab_ref[...]  # [1, blk] int32
        hi = lab >> shift
        lo = lab & (nlo - 1)
        sub_lo = jax.lax.broadcasted_iota(jnp.int32, (nlo, 1), 0)
        ohlo_t = (lo == sub_lo).astype(jnp.bfloat16)  # [nlo, blk]

        # Byte planes from the channel rows, built entirely in VMEM per
        # the static plan — each plane an exact-in-bf16 value in [0, 255].
        d = d_ref[...]  # [c, blk] int32, channel on sublane
        planes = []
        for ch, (off, nsb, nqb) in enumerate(plan):
            v = d[ch : ch + 1] + off if off else d[ch : ch + 1]
            for b_ in range(nsb):
                planes.append((v >> (8 * b_)) & 255)
            sq = d[ch : ch + 1] * d[ch : ch + 1]
            for b_ in range(nqb):
                planes.append((sq >> (8 * b_)) & 255)
        pall = jnp.concatenate(planes, axis=0)  # [nplanes, blk] int32

        # kr rows h*nplanes + p hold plane p masked to hi == h; the
        # trailing nhi rows are the hi one-hots (per-label counts).
        pieces = [
            jnp.where(hi == h, pall, 0) for h in range(nhi)
        ] + [(hi == h).astype(jnp.int32) for h in range(nhi)]
        kr_t = jnp.concatenate(pieces, axis=0).astype(jnp.bfloat16)
        acc[...] += jax.lax.dot_general(
            kr_t, ohlo_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == nb - 1)
        def _():
            out_ref[...] = acc[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_labels", "block", "channel_bounds",
                              "vma", "interpret")
)
def moment_tally_pallas(
    labels: jnp.ndarray,
    data: jnp.ndarray,
    num_labels: int,
    *,
    block: int = 1024,
    channel_bounds: tuple | None = None,
    vma: tuple | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-label count/sum/sum-sq table [1 + 2C, L] from channel planes.

    labels int [B]; data [C, B] integer-valued with |v| <= 32767, C <= 8.
    The drop-in TPU form of ops/superpixels.init_stats's matmul path: the
    byte-plane decomposition, Khatri-Rao mask, and count rows are all
    built in VMEM from the raw channel rows, so HBM sees only [C, B] int32
    and the labels once — no [B, 50] operand, no lane-padded [B, 1]
    labels column (each of which cost more HBM than the whole tally).

    channel_bounds: optional static per-channel (lo, hi) value bounds.
    The tally is MXU-bound (kr rows x nlo x B MACs), and tight bounds cut
    the byte-plane row count — (0, 255) image channels need 3 rows, not
    the conservative int16 6 — for ~40% less matmul work on the
    superpixel feature stack.  Bounds need only hold for pixels whose
    label actually tallies (OOB/sentinel-labeled pixels are masked).
    """
    c, b = data.shape
    assert c <= 8, "moment kernel supports up to 8 channels"
    if channel_bounds is None:
        channel_bounds = ((-32768, 32767),) * c
    assert len(channel_bounds) == c
    plan = _channel_plan(channel_bounds)
    nplanes = sum(nsb + nqb for _, nsb, nqb in plan)
    nlo = 128
    while nlo < 1024 and nlo * nlo < (1 + nplanes) * num_labels:
        nlo *= 2
    nhi = -(-num_labels // nlo)
    nb = -(-b // block)

    lab_p = jnp.pad(
        labels.astype(jnp.int32).reshape(-1), (0, nb * block - b),
        constant_values=nhi * nlo,
    ).reshape(1, nb * block)
    d_p = jnp.pad(data.astype(jnp.int32), ((0, 0), (0, nb * block - b)))

    nrows = nplanes * nhi + nhi
    t = pl.pallas_call(
        _make_moment_kernel(block, nhi, nlo, nb, plan),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrows, nlo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nrows, nlo), jnp.float32,
            **({"vma": frozenset(vma)} if vma else {}),
        ),
        scratch_shapes=[pltpu.VMEM((nrows, nlo), jnp.float32)],
        interpret=interpret,
    )(lab_p, d_p)

    kr = t[: nplanes * nhi].reshape(nhi, nplanes, nlo)
    count = t[nplanes * nhi : nplanes * nhi + nhi].reshape(-1)[:num_labels]
    sums, sqs = [], []
    pos = 0
    for off, nsb, nqb in plan:
        s = sum(
            kr[:, pos + b_, :].reshape(-1)[:num_labels] * float(256 ** b_)
            for b_ in range(nsb)
        )
        sums.append(s - float(off) * count if off else s)
        pos += nsb
        sqs.append(sum(
            kr[:, pos + b_, :].reshape(-1)[:num_labels] * float(256 ** b_)
            for b_ in range(nqb)
        ))
        pos += nqb
    return jnp.stack([count] + sums + sqs, axis=0)


@functools.partial(
    jax.jit, static_argnames=("num_labels", "block", "interpret")
)
def label_tally_pallas(
    labels: jnp.ndarray,
    values: jnp.ndarray,
    num_labels: int,
    *,
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-label sums out[l, c] — drop-in for ops/tally.py::label_tally.

    labels int [B]; values [B, C] with bf16-exact entries.  Returns f32
    [num_labels, C].
    """
    b, c = values.shape
    nlo = 128
    while nlo < 1024 and nlo * nlo < c * num_labels:
        nlo *= 2
    nhi = -(-num_labels // nlo)

    nb = -(-b // block)
    lab_p = jnp.pad(
        labels.astype(jnp.int32).reshape(-1), (0, nb * block - b),
        constant_values=nhi * nlo,  # all-zero ohhi row
    )[:, None]
    v_p = jnp.pad(values.astype(jnp.bfloat16), ((0, nb * block - b), (0, 0)))

    t = pl.pallas_call(
        _make_tally_kernel(block, c, nhi, nlo, nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c * nhi, nlo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c * nhi, nlo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c * nhi, nlo), jnp.float32)],
        interpret=interpret,
    )(lab_p, v_p)
    # t[h * c + c_idx, lo] -> out[l = h * nlo + lo, c_idx]
    out = t.reshape(nhi, c, nlo).transpose(1, 0, 2).reshape(c, nhi * nlo)
    return out[:, :num_labels].T

"""Fused census-cost + SGM path aggregation as Pallas TPU kernels.

XLA-level SGM (ops/stereo.py) spends most of its time in the four
`lax.scan` recurrences and the materialized uint8 cost volume shuffling.
These kernels keep the census images and the path carry resident in VMEM
and compute the hamming cost on the fly for the horizontal passes.

Layout strategy (the whole trick):
  * census images are stored TRANSPOSED [W, H] so the 128-disparity
    matching window of column x is one contiguous SUBLANE slice
    [x - minD - 127 : x - minD + 1, :] — dynamic sublane slicing is cheap
    on TPU, dynamic lane slicing is not;
  * the disparity axis is kept REVERSED (d' = D-1-d) everywhere inside the
    kernels — the window slice arrives ascending in column = descending in
    d — and un-reversed once at the end with a single XLA flip;
  * horizontal passes emit S in [W, D, H]; the cost volume is emitted once
    and transposed (XLA) to [H, D, W] for the vertical passes, whose carry
    is [D, W] with d-neighbor shifts = sublane shifts.

The recurrence is the standard SGM normalization (identical to
ops/stereo.py::_aggregate_scan):
    L(p,d) = C(p,d) + min(L(q,d), L(q,d±1)+P1, min_d' L(q,d') + P2)
           - min_d' L(q,d')
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COST_INVALID = 62
_BIG = 1 << 20
# Double-buffered input budget for the fused bt+WTA kernel's block-size
# pick (ops/pallas/sgm.py: rps2 loop).  Module-level so perf probes can
# override it without editing the kernel.
_BTWTA_VMEM_BUDGET = 5 * 1024 * 1024


def _round_up(x, m):
    return -(-x // m) * m


def _min_sublanes(x):
    """min over axis 0 (keepdims) that also lowers for narrow int dtypes.

    Mosaic implements cross-sublane reduce only for 32-bit types; for
    int16/int8 a halving tree of elementwise minimums (supported at any
    width) computes the same value in log2(D) rounds of shrinking work.
    """
    if x.dtype == jnp.int32:
        return jnp.min(x, axis=0, keepdims=True)
    n = x.shape[0]
    while n > 1:
        half = n // 2
        m = jnp.minimum(x[:half], x[half : 2 * half])
        x = jnp.concatenate([m, x[2 * half :]], axis=0) if n % 2 else m
        n = n - half
    return x


def _recurrence(carry, cost, p1, p2):
    """carry, cost: [D, R] int -> new carry, same dtype.

    Normalized path values are bounded by C_max + P2 (182 for the
    defaults), so int16 accumulation is bit-exact and halves the VPU
    work per pass; the +inf stand-in only needs to exceed any real
    m + p2 while leaving headroom for +p1 (16384 + p1 stays in int16
    for every config that qualifies for the int16 path).
    """
    big = _BIG if carry.dtype == jnp.int32 else 1 << 14
    m = _min_sublanes(carry)
    dn = jnp.concatenate([jnp.full_like(carry[:1], big), carry[:-1]], axis=0)
    up = jnp.concatenate([carry[1:], jnp.full_like(carry[:1], big)], axis=0)
    best = jnp.minimum(jnp.minimum(carry, jnp.minimum(dn, up) + p1), m + p2)
    return cost + best - m


def _acc_dtype(p1, p2):
    """Accumulation dtype for the sweep carries.

    int16 would be bit-exact in the small-cost regime (path values
    <= C_max + p2 <= 182 for the defaults) and halve the VPU work, but
    the current Mosaic lowering legalizes almost no packed-i16 vector
    arithmetic (arith.minsi/cmpi/subi on vector<8x128x2xi16> all fail to
    legalize on v5e; only add and 32-bit-masked selects work — probed
    round 4), so the carries stay int32 until Mosaic catches up.  The
    interpret-mode tests pass either way; only real lowering gates this.
    """
    del p1, p2
    return jnp.int32


def _make_hsweep(h, w, d, pad, min_disparity, p1, p2, cols_per_step, backward,
                 real_w, s_dtype=jnp.int16, real_h=None):
    """Horizontal pass kernel. Census inputs [Wpad, H] int32 (x offset by
    `pad`); outputs S [W, D, H] and (forward only) cost [W, D, H] int8.

    Columns x >= real_w are padding: their cost is forced to the UNIFORM
    constant _COST_INVALID so the backward pass warms up through them with a
    uniform carry — the recurrence maps a uniform carry to `cost + const -
    const`, i.e. entering the last real column is equivalent to a zero-init
    there.  (Without this, padded-left-census-vs-real-right-census costs
    leaked into the last ~P2/P1 real columns whenever width % 8 != 0.)

    When `real_h` < h, rows >= real_h are padding lanes whose cost is the
    same uniform constant — the bottom-up consumer's warmup through them
    is then exactly equivalent to a zero carry at the last real row, so
    the H padding can be emitted here instead of in a separate XLA pad.
    """
    nblocks = w // cols_per_step
    if real_h is None:
        real_h = h
    acc = _acc_dtype(p1, p2)

    def kernel(cl0, cl1, cr0, cr1, s_out, c_out, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[...] = jnp.zeros((d, h), acc)

        for cc in range(cols_per_step):
            c = cols_per_step - 1 - cc if backward else cc
            # Global column this block element refers to.
            blk = (nblocks - 1 - i) if backward else i
            x = blk * cols_per_step + c

            # Window of right census: columns x-minD-(D-1) .. x-minD,
            # ascending column == descending disparity (d' = reversed).
            # Mosaic requires 8-aligned dynamic sublane starts; the start's
            # residue mod 8 is STATIC per in-block column, so load an
            # aligned (d+8)-row window and slice the residue statically.
            start = x + pad - min_disparity - (d - 1)
            # x = blk*cols_per_step + c, so x mod 8 == c mod 8 (static).
            r = (c + pad - min_disparity - (d - 1)) % 8
            a0 = pl.multiple_of(start - r, 8)
            w0 = cr0[pl.ds(a0, d + 8), :][r : r + d]
            w1 = cr1[pl.ds(a0, d + 8), :][r : r + d]
            rl = (c + pad) % 8
            al = pl.multiple_of(x + pad - rl, 8)
            l0 = cl0[pl.ds(al, 8), :][rl : rl + 1]
            l1 = cl1[pl.ds(al, 8), :][rl : rl + 1]
            cost = jax.lax.population_count(w0 ^ l0) + jax.lax.population_count(
                w1 ^ l1
            )
            # Mask disparities reading left of column 0:
            # valid iff x - minD - (D-1-j) >= 0  (j = sublane index).
            j = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
            valid = (j >= (d - 1) + min_disparity - x) & (x < real_w)
            if real_h < h:
                hl = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
                valid = valid & (hl < real_h)
            cost = jnp.where(valid, cost, _COST_INVALID).astype(acc)

            new = _recurrence(carry[...], cost, p1, p2)
            carry[...] = new
            s_out[c] = new.astype(s_dtype)
            if c_out is not None:
                c_out[c] = cost.astype(jnp.int8)

    if backward:
        def kern(cl0, cl1, cr0, cr1, s_ref, carry):
            kernel(cl0, cl1, cr0, cr1, s_ref, None, carry)
        return kern
    return kernel


def _make_vsweep(h, wt, d, p1, p2, rows_per_step, backward,
                 s_dtype=jnp.int16):
    """Vertical pass kernel over cost [H, D, W] int8 -> S [H, D, W].

    Gridded (w_tiles, h_blocks) with the H scan on the FASTEST grid axis so
    each W tile's rows run consecutively; the carry is per-tile [D, wt],
    reset at the tile's first row block.  W tiling keeps VMEM bounded at
    256 disparities.
    """

    acc = _acc_dtype(p1, p2)

    def kernel(c_in, s_out, carry):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            carry[...] = jnp.zeros((d, wt), acc)

        for rr in range(rows_per_step):
            r = rows_per_step - 1 - rr if backward else rr
            cost = c_in[r].astype(acc)
            new = _recurrence(carry[...], cost, p1, p2)
            carry[...] = new
            s_out[r] = new.astype(s_dtype)

    return kernel


def _make_btwta_kernel(
    rps, d, wv, p1, p2, min_disparity, uniqueness, subpixel, lr_check, real_w
):
    """Fused bottom-up vertical sweep + WTA/uniqueness/subpixel/LR.

    Grid walks the H blocks BACKWARD; per row (reverse order within the
    block) the bt recurrence advances the [D, Wv] carry, the 4-path sum is
    assembled from the three stored volumes plus the live carry, and the
    full WTA pipeline (ops/pallas/wta.py::wta_lr_row) emits the disparity
    row — the [H, D, W] bt volume never exists in HBM and the summed
    volume is never re-read.
    """
    from .wta import wta_lr_row

    acc = _acc_dtype(p1, p2)

    def kernel(c_in, slr, srl, stb, out_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[...] = jnp.zeros((d, wv), acc)

        for rr in range(rps):
            r = rps - 1 - rr  # bottom-up within the block
            new = _recurrence(carry[...], c_in[r].astype(acc), p1, p2)
            carry[...] = new
            s = (
                slr[r].astype(acc)
                + srl[r].astype(acc)
                + stb[r].astype(acc)
                + new
            )
            out_ref[0, r] = wta_lr_row(
                s, min_disparity, uniqueness, subpixel, lr_check, real_w
            )

    return kernel


def _make_vcarry(d, p1, p2, rows_per_step, backward):
    """Settle-phase kernel for the sharded split-scan chain: advance the
    [D, wt] carry across every row block (same `_recurrence` as the output
    sweeps), emitting ONLY the final carry — no S volume writes.  Used by
    `sgm_fused_pallas_sharded` to compute each shard's hand-off carry."""
    acc = _acc_dtype(p1, p2)

    def kernel(cin, c_in, cout, carry):
        i = pl.program_id(1)
        nb = pl.num_programs(1)

        @pl.when(i == 0)
        def _():
            carry[...] = cin[...]

        for rr in range(rows_per_step):
            r = rows_per_step - 1 - rr if backward else rr
            carry[...] = _recurrence(carry[...], c_in[r].astype(acc), p1, p2)

        @pl.when(i == nb - 1)
        def _():
            cout[...] = carry[...]

    return kernel


def _make_vsweep_cin(d, p1, p2, rows_per_step, backward, s_dtype):
    """`_make_vsweep` with an explicit initial carry (the predecessor
    shard's settled hand-off) instead of a zero reset."""
    acc = _acc_dtype(p1, p2)

    def kernel(cin, c_in, s_out, carry):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            carry[...] = cin[...]

        for rr in range(rows_per_step):
            r = rows_per_step - 1 - rr if backward else rr
            new = _recurrence(carry[...], c_in[r].astype(acc), p1, p2)
            carry[...] = new
            s_out[r] = new.astype(s_dtype)

    return kernel


def _make_btwta_cin_kernel(
    rps, d, wv, p1, p2, min_disparity, uniqueness, subpixel, lr_check, real_w
):
    """`_make_btwta_kernel` with an explicit initial bottom-up carry."""
    from .wta import wta_lr_row

    acc = _acc_dtype(p1, p2)

    def kernel(cin, c_in, slr, srl, stb, out_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[...] = cin[...]

        for rr in range(rps):
            r = rps - 1 - rr  # bottom-up within the block
            new = _recurrence(carry[...], c_in[r].astype(acc), p1, p2)
            carry[...] = new
            s = (
                slr[r].astype(acc)
                + srl[r].astype(acc)
                + stb[r].astype(acc)
                + new
            )
            out_ref[0, r] = wta_lr_row(
                s, min_disparity, uniqueness, subpixel, lr_check, real_w
            )

    return kernel


def sgm_fused_pallas_sharded(
    left_census: tuple[jnp.ndarray, jnp.ndarray],
    right_census: tuple[jnp.ndarray, jnp.ndarray],
    *,
    axis_name: str,
    min_disparity: int,
    num_disparities: int,
    p1: int = 10,
    p2: int = 120,
    uniqueness: int = 12,
    subpixel: bool = True,
    lr_check: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Height-sharded `sgm_fused_pallas`: bit-equal to the full frame.

    Runs INSIDE a shard_map over `axis_name` on each shard's census rows.
    The census cost, horizontal sweeps, WTA, uniqueness, subpixel and LR
    check are row-local, so each shard runs the same fused kernels as the
    single-chip path; the two vertical recurrences are made exact across
    shard seams by the split-scan carry hand-off of
    parallel/sgm_sharded.py (`_vertical_chain`): n-1 settle sweeps of the
    tiny [D, W] carry (a carry-only kernel, no S writes) chained through
    `ppermute`, then one output sweep seeded with the true predecessor
    carry.  Replaces that module's XLA scans as the TPU path — the scans
    cost ~1.8x the fused kernels at equal geometry (VERDICT r4 item 4).

    Row blocks are 1 row tall (shard heights like KITTI's 376/8 = 47 are
    not multiples of 8), and the shard's row count is used unpadded — the
    vertical chain must never pass a carry through fake rows.
    """
    d = num_disparities
    h, w = left_census[0].shape
    cps = 8
    wb = _round_up(w, cps)
    pad = min_disparity + d - 1 + 8
    vol_dtype = jnp.uint8 if _COST_INVALID + p2 <= 255 else jnp.int16
    acc = _acc_dtype(p1, p2)
    vma = {"vma": frozenset({axis_name})}

    wv = _round_up(wb, 128)
    wt = wv
    while wt * d * (1 * 3 + 4) > 6 * 1024 * 1024 and wt % 2 == 0 and wt > 128:
        wt //= 2
    if wt % 128 != 0:
        wt = _round_up(wt, 128)
    wv = _round_up(wv, wt)
    wtiles = wv // wt

    def prep(a):
        at = jnp.transpose(a, (1, 0))  # [W, h]
        return jnp.pad(at, ((pad, wb - w + 8), (0, 0)))

    cl0, cl1 = prep(left_census[0]), prep(left_census[1])
    cr0, cr1 = prep(right_census[0]), prep(right_census[1])

    census_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    nblocks = wb // cps

    fwd = pl.pallas_call(
        _make_hsweep(h, wb, d, pad, min_disparity, p1, p2, cps,
                     backward=False, real_w=w, s_dtype=vol_dtype),
        grid=(nblocks,),
        in_specs=[census_spec] * 4,
        out_specs=[
            pl.BlockSpec((cps, d, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cps, d, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((wv, d, h), vol_dtype, **vma),
            jax.ShapeDtypeStruct((wv, d, h), jnp.int8, **vma),
        ],
        scratch_shapes=[pltpu.VMEM((d, h), acc)],
        interpret=interpret,
    )
    s_lr, cost_wdh = fwd(cl0, cl1, cr0, cr1)

    bwd = pl.pallas_call(
        _make_hsweep(h, wb, d, pad, min_disparity, p1, p2, cps,
                     backward=True, real_w=w, s_dtype=vol_dtype),
        grid=(nblocks,),
        in_specs=[census_spec] * 4,
        out_specs=pl.BlockSpec(
            (cps, d, h), lambda i: (nblocks - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((wv, d, h), vol_dtype, **vma),
        scratch_shapes=[pltpu.VMEM((d, h), acc)],
        interpret=interpret,
    )
    s_rl = bwd(cl0, cl1, cr0, cr1)

    def to_hdw(vol):
        return jnp.transpose(vol, (2, 1, 0))  # [h, D, Wv]

    cost_hdw = to_hdw(cost_wdh)
    slr_hdw = to_hdw(s_lr)
    srl_hdw = to_hdw(s_rl)

    # --- split-scan vertical chains (mirrors sgm_sharded._vertical_chain)
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # cost * 0 (not literal zeros) so the carry inherits the varying-
    # manual-axes type under shard_map (same trick as _vertical_chain).
    zero = cost_hdw[0].astype(jnp.int32) * 0
    cin_spec = pl.BlockSpec((d, wt), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    cost_spec = pl.BlockSpec((1, d, wt), lambda j, i: (i, 0, j),
                             memory_space=pltpu.VMEM)

    def vcarry(carry_in, backward):
        spec = pl.BlockSpec(
            (1, d, wt),
            (lambda j, i: (h - 1 - i, 0, j)) if backward
            else (lambda j, i: (i, 0, j)),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            _make_vcarry(d, p1, p2, 1, backward),
            grid=(wtiles, h),
            in_specs=[cin_spec, spec],
            out_specs=pl.BlockSpec((d, wt), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, wv), jnp.int32, **vma),
            scratch_shapes=[pltpu.VMEM((d, wt), acc)],
            interpret=interpret,
        )(carry_in, cost_hdw)

    def settled_carry(backward):
        if backward:
            perm = [(i, i - 1) for i in range(1, n)]
            edge = n - 1
        else:
            perm = [(i, i + 1) for i in range(n - 1)]
            edge = 0

        def settle(_, carry):
            fin = vcarry(carry, backward)
            recv = jax.lax.ppermute(fin, axis_name, perm)
            return jnp.where(idx == edge, zero, recv)

        return jax.lax.fori_loop(0, n - 1, settle, zero)

    tb_cin = settled_carry(backward=False)
    s_tb = pl.pallas_call(
        _make_vsweep_cin(d, p1, p2, 1, backward=False, s_dtype=vol_dtype),
        grid=(wtiles, h),
        in_specs=[cin_spec, cost_spec],
        out_specs=pl.BlockSpec((1, d, wt), lambda j, i: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, d, wv), vol_dtype, **vma),
        scratch_shapes=[pltpu.VMEM((d, wt), acc)],
        interpret=interpret,
    )(tb_cin, cost_hdw)

    bt_cin = settled_carry(backward=True)
    spec2 = lambda: pl.BlockSpec(
        (1, d, wv), lambda i: (h - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_btwta_cin_kernel(
            1, d, wv, p1, p2, min_disparity, uniqueness, subpixel,
            lr_check, real_w=w,
        ),
        grid=(h,),
        in_specs=[
            pl.BlockSpec((d, wv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            spec2(), spec2(), spec2(), spec2(),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, wv), lambda i: (h - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h, 1, wv), jnp.int16, **vma),
        scratch_shapes=[pltpu.VMEM((d, wv), acc)],
        interpret=interpret,
    )(bt_cin, cost_hdw, slr_hdw, srl_hdw, s_tb)
    return out.reshape(h, wv)[:, :w]


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_disparity", "num_disparities", "p1", "p2", "interpret", "flip",
        "combine",
    ),
)
def sgm_aggregate_pallas(
    left_census: tuple[jnp.ndarray, jnp.ndarray],
    right_census: tuple[jnp.ndarray, jnp.ndarray],
    *,
    min_disparity: int,
    num_disparities: int,
    p1: int = 10,
    p2: int = 120,
    interpret: bool = False,
    flip: bool = True,
    combine: str = "sum",
) -> jnp.ndarray:
    """4-path aggregated cost [H, W, D] int16 from census word pairs [H, W].

    Drop-in replacement for hamming_cost_volume + sgm_aggregate in
    ops/stereo.py (bit-identical recurrence, different schedule).

    flip=False returns the volume with the d axis REVERSED (the kernels'
    native layout) — consumers that index d through stereo._d_true avoid
    two full-volume flips.
    """
    d = num_disparities
    h, w = left_census[0].shape
    cps = 8
    wb = _round_up(w, cps)
    # Left history + 8 rows of alignment slack on both sides.
    pad = min_disparity + d - 1 + 8
    acc = _acc_dtype(p1, p2)

    # Transposed, padded census: [pad + Wb + 8, H].
    def prep(a, fill):
        at = jnp.transpose(a, (1, 0))  # [W, H]
        return jnp.pad(at, ((pad, wb - w + 8), (0, 0)), constant_values=fill)

    cl0, cl1 = prep(left_census[0], 0), prep(left_census[1], 0)
    # Out-of-range reads (x-minD-d < 0) are masked in-kernel; the left pad
    # value only needs to be *something*.
    cr0, cr1 = prep(right_census[0], 0), prep(right_census[1], 0)

    census_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    nblocks = wb // cps

    fwd = pl.pallas_call(
        _make_hsweep(h, wb, d, pad, min_disparity, p1, p2, cps, backward=False,
                     real_w=w),
        grid=(nblocks,),
        in_specs=[census_spec] * 4,
        out_specs=[
            pl.BlockSpec((cps, d, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cps, d, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((wb, d, h), jnp.int16),
            jax.ShapeDtypeStruct((wb, d, h), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((d, h), acc)],
        interpret=interpret,
    )
    s_lr, cost_wdh = fwd(cl0, cl1, cr0, cr1)

    bwd = pl.pallas_call(
        _make_hsweep(h, wb, d, pad, min_disparity, p1, p2, cps, backward=True,
                     real_w=w),
        grid=(nblocks,),
        in_specs=[census_spec] * 4,
        out_specs=pl.BlockSpec(
            (cps, d, h), lambda i: (nblocks - 1 - i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((wb, d, h), jnp.int16),
        scratch_shapes=[pltpu.VMEM((d, h), acc)],
        interpret=interpret,
    )
    s_rl = bwd(cl0, cl1, cr0, cr1)

    # Vertical passes on the transposed cost volume, W-tiled to bound VMEM.
    # Tiles must be lane-aligned (multiples of 128), so the volume's W is
    # padded up; padded columns cost 0 uniformly (harmless, sliced off).
    rps = 8
    hb = _round_up(h, rps)
    cost_hdw = jnp.transpose(cost_wdh, (2, 1, 0))  # [H, D, Wb]
    wt = wv = _round_up(wb, 128)
    while wt * d * (rps * 3 + 4) > 6 * 1024 * 1024 and wt % 2 == 0 and wt > 128:
        wt //= 2
    if wt % 128 != 0:
        wt = _round_up(wt, 128)
    wv = _round_up(wv, wt)
    cost_hdw = jnp.pad(cost_hdw, ((0, hb - h), (0, 0), (0, wv - wb)))
    vblocks = hb // rps
    wtiles = wv // wt

    tb = pl.pallas_call(
        _make_vsweep(hb, wt, d, p1, p2, rps, backward=False),
        grid=(wtiles, vblocks),
        in_specs=[
            pl.BlockSpec(
                (rps, d, wt), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (rps, d, wt), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hb, d, wv), jnp.int16),
        scratch_shapes=[pltpu.VMEM((d, wt), acc)],
        interpret=interpret,
    )
    s_tb = tb(cost_hdw)

    bt = pl.pallas_call(
        _make_vsweep(hb, wt, d, p1, p2, rps, backward=True),
        grid=(wtiles, vblocks),
        in_specs=[
            pl.BlockSpec(
                (rps, d, wt), lambda j, i: (vblocks - 1 - i, 0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (rps, d, wt), lambda j, i: (vblocks - 1 - i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((hb, d, wv), jnp.int16),
        scratch_shapes=[pltpu.VMEM((d, wt), acc)],
        interpret=interpret,
    )
    s_bt = bt(cost_hdw)

    # Combine in a common [H, W, D] layout and un-reverse the d axis.
    # int16 is exact: each normalized path value <= C_max + P2, so the
    # 4-path sum stays well under 32767.
    s_h = jnp.transpose(s_lr + s_rl, (2, 0, 1))
    s_h = s_h[:, :w, :]  # [H, W, D]
    s_v = jnp.transpose(s_tb + s_bt, (0, 2, 1))
    s_v = s_v[:h, :w, :]
    s = s_h + s_v
    return s[..., ::-1] if flip else s


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_disparity", "num_disparities", "p1", "p2", "uniqueness",
        "subpixel", "lr_check", "interpret",
    ),
)
def sgm_fused_pallas(
    left_census: tuple[jnp.ndarray, jnp.ndarray],
    right_census: tuple[jnp.ndarray, jnp.ndarray],
    *,
    min_disparity: int,
    num_disparities: int,
    p1: int = 10,
    p2: int = 120,
    uniqueness: int = 12,
    subpixel: bool = True,
    lr_check: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Census pair -> int16 x16 disparity, minimal-HBM-traffic schedule.

    vs the split path (sgm_aggregate_pallas + sgm_wta_lr_pallas), this
    version (a) stores the three kept path volumes at uint8 (the libSGM
    normalization bounds each value by C_max + P2 <= 255 for p2 <= 193),
    (b) never materializes the bottom-up volume or the 4-path sum — the
    final kernel fuses the bt recurrence with the WTA/LR pipeline and
    emits disparity rows directly.  Bit-identical to the XLA path in
    ops/stereo.py (tested in interpret mode).
    """
    d = num_disparities
    h, w = left_census[0].shape
    cps = 8
    wb = _round_up(w, cps)
    pad = min_disparity + d - 1 + 8
    vol_dtype = jnp.uint8 if _COST_INVALID + p2 <= 255 else jnp.int16
    acc = _acc_dtype(p1, p2)

    # The sweep kernels emit the FINAL padded extents directly (H padded
    # to the row-block multiple via the uniform-cost warmup trick, W via
    # untouched — masked — columns), so the [H, D, W] volumes need one
    # bare transpose each and no separate XLA pad passes.
    rps = 8
    hb = _round_up(h, rps)
    wv = _round_up(wb, 128)
    wt = wv
    while wt * d * (rps * 3 + 4) > 6 * 1024 * 1024 and wt % 2 == 0 and wt > 128:
        wt //= 2
    if wt % 128 != 0:
        wt = _round_up(wt, 128)
    wv = _round_up(wv, wt)
    wtiles = wv // wt

    def prep(a):
        at = jnp.transpose(a, (1, 0))  # [W, H]
        return jnp.pad(at, ((pad, wb - w + 8), (0, hb - h)))

    cl0, cl1 = prep(left_census[0]), prep(left_census[1])
    cr0, cr1 = prep(right_census[0]), prep(right_census[1])

    census_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    nblocks = wb // cps

    fwd = pl.pallas_call(
        _make_hsweep(hb, wb, d, pad, min_disparity, p1, p2, cps,
                     backward=False, real_w=w, s_dtype=vol_dtype, real_h=h),
        grid=(nblocks,),
        in_specs=[census_spec] * 4,
        out_specs=[
            pl.BlockSpec((cps, d, hb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cps, d, hb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((wv, d, hb), vol_dtype),
            jax.ShapeDtypeStruct((wv, d, hb), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((d, hb), acc)],
        interpret=interpret,
    )
    s_lr, cost_wdh = fwd(cl0, cl1, cr0, cr1)

    bwd = pl.pallas_call(
        _make_hsweep(hb, wb, d, pad, min_disparity, p1, p2, cps,
                     backward=True, real_w=w, s_dtype=vol_dtype, real_h=h),
        grid=(nblocks,),
        in_specs=[census_spec] * 4,
        out_specs=pl.BlockSpec(
            (cps, d, hb), lambda i: (nblocks - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((wv, d, hb), vol_dtype),
        scratch_shapes=[pltpu.VMEM((d, hb), acc)],
        interpret=interpret,
    )
    s_rl = bwd(cl0, cl1, cr0, cr1)

    def to_hdw(vol):
        return jnp.transpose(vol, (2, 1, 0))  # [Hb, D, Wv]

    cost_hdw = to_hdw(cost_wdh)
    slr_hdw = to_hdw(s_lr)
    srl_hdw = to_hdw(s_rl)
    vblocks = hb // rps

    tb = pl.pallas_call(
        _make_vsweep(hb, wt, d, p1, p2, rps, backward=False,
                     s_dtype=vol_dtype),
        grid=(wtiles, vblocks),
        in_specs=[
            pl.BlockSpec(
                (rps, d, wt), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (rps, d, wt), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hb, d, wv), vol_dtype),
        scratch_shapes=[pltpu.VMEM((d, wt), acc)],
        interpret=interpret,
    )
    s_tb = tb(cost_hdw)

    # Fused bottom-up sweep + WTA: row blocks walked backward, full-width
    # planes (the LR shear crosses the whole row).  The WTA body keeps
    # several [D, Wv] int32 temporaries live, so the block budget is tight:
    # 4 double-buffered input blocks must stay under ~5 MB.
    rps2 = 8
    itemsize = 2 if vol_dtype == jnp.int16 else 1
    while rps2 > 1 and 2 * rps2 * d * wv * (3 * itemsize + 1) > _BTWTA_VMEM_BUDGET:
        rps2 //= 2
    while hb % rps2:
        rps2 //= 2
    nb2 = hb // rps2
    spec2 = lambda: pl.BlockSpec(
        (rps2, d, wv), lambda i: (nb2 - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_btwta_kernel(
            rps2, d, wv, p1, p2, min_disparity, uniqueness, subpixel,
            lr_check, real_w=w,
        ),
        grid=(nb2,),
        in_specs=[spec2(), spec2(), spec2(), spec2()],
        out_specs=pl.BlockSpec(
            (1, rps2, wv), lambda i: (nb2 - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb2, rps2, wv), jnp.int16),
        scratch_shapes=[pltpu.VMEM((d, wv), acc)],
        interpret=interpret,
    )(cost_hdw, slr_hdw, srl_hdw, s_tb)
    return out.reshape(hb, wv)[:h, :w]

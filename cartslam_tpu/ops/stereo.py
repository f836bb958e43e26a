"""Census + Semi-Global Matching stereo disparity, TPU-native.

Replaces the reference's use of cv::cuda::StereoSGM (created with
minDisparity=4, numDisparities=256, blockSize=3, uniqueness=12 at
include/modules/disparity.hpp:26-34).  Output contract is kept identical:
int16 disparity in x16 fixed point, invalid pixels = -32768
(include/modules/disparity.hpp:17).

Design (TPU-first, not a CUDA port):
  * 9x7 census transform packed into two int32 words (62 bits).
  * Hamming cost volume [D, H, W] uint8 via XOR + population_count.
  * 4-path SGM aggregation (left/right/up/down) as `lax.scan` recurrences,
    vectorized over the non-scan axes so every scan step is a wide VPU op.
  * Winner-take-all + OpenCV-SGBM-style uniqueness test, left-right
    consistency check, and quadratic sub-pixel refinement.

A Pallas fused kernel (cost-on-the-fly aggregation) can replace the
materialized cost volume; see ops/pallas/sgm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DISPARITY_INVALID = -32768

CENSUS_WH = 9  # window width
CENSUS_HT = 7  # window height

# Cost of an out-of-range candidate (max hamming distance of a 62-bit census).
_COST_INVALID = 62


def census_transform(gray: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """9x7 census transform -> two int32 bit-plane words [H, W].

    Bit k is set when the k-th neighbor (row-major over the window, center
    skipped) is strictly greater than the center pixel.
    """
    g = gray.astype(jnp.int32)
    ph, pw = CENSUS_HT // 2, CENSUS_WH // 2
    padded = jnp.pad(g, ((ph, ph), (pw, pw)), mode="edge")
    h, w = g.shape

    words = [jnp.zeros((h, w), jnp.int32), jnp.zeros((h, w), jnp.int32)]
    bit = 0
    for dy in range(-ph, ph + 1):
        for dx in range(-pw, pw + 1):
            if dy == 0 and dx == 0:
                continue
            nb = jax.lax.dynamic_slice(padded, (dy + ph, dx + pw), (h, w))
            b = (nb > g).astype(jnp.int32)
            word = bit // 31
            words[word] = words[word] | (b << (bit % 31))
            bit += 1
    return words[0], words[1]


def hamming_cost_volume(
    left_census: tuple[jnp.ndarray, jnp.ndarray],
    right_census: tuple[jnp.ndarray, jnp.ndarray],
    min_disparity: int,
    num_disparities: int,
) -> jnp.ndarray:
    """Cost volume [D, H, W] uint8: hamming(censusL[x], censusR[x-d]).

    Candidates reading outside the right image get _COST_INVALID.
    """
    l0, l1 = left_census
    r0, r1 = right_census
    h, w = l0.shape
    max_d = min_disparity + num_disparities
    # Pad right census on the left so slice [pad-d : pad-d+w] = shift by d.
    r0p = jnp.pad(r0, ((0, 0), (max_d, 0)))
    r1p = jnp.pad(r1, ((0, 0), (max_d, 0)))

    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def one_disp(d):
        rd0 = jax.lax.dynamic_slice(r0p, (0, max_d - d), (h, w))
        rd1 = jax.lax.dynamic_slice(r1p, (0, max_d - d), (h, w))
        c = jax.lax.population_count(l0 ^ rd0) + jax.lax.population_count(l1 ^ rd1)
        c = jnp.where(cols >= d, c, _COST_INVALID)
        return c.astype(jnp.uint8)

    return jnp.stack(
        [one_disp(min_disparity + i) for i in range(num_disparities)], axis=0
    )


def sgm_scan_step(p1: int, p2: int):
    """The SGM path recurrence as a `lax.scan` step over [R, D] carries.

    L(p,d) = C(p,d) + min(L(p-1,d), L(p-1,d±1)+P1, min_d' L(p-1,d') + P2)
           - min_d' L(p-1,d')          (libSGM-style normalization keeps
                                        values bounded by C_max + P2)

    Exposed so height-sharded aggregation (parallel/sgm_sharded.py) can
    continue a sweep from a neighbor shard's final carry: with the true
    predecessor carry as init, the scan is an exact continuation of the
    full-frame recurrence.
    """
    big = jnp.int32(1 << 20)

    def step(carry, c):
        m = jnp.min(carry, axis=-1, keepdims=True)
        dn = jnp.concatenate([jnp.full_like(carry[..., :1], big), carry[..., :-1]], -1)
        up = jnp.concatenate([carry[..., 1:], jnp.full_like(carry[..., :1], big)], -1)
        best = jnp.minimum(
            jnp.minimum(carry, jnp.minimum(dn, up) + p1), m + p2
        )
        new = c.astype(jnp.int32) + best - m
        return new, new.astype(jnp.int16)

    return step


def _aggregate_scan(cost_sdr: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """Path aggregation along axis 0 of [S, R, D] (R = vectorized rest)."""
    step = sgm_scan_step(p1, p2)
    # Derive the zero init from the input so it inherits the input's
    # varying-manual-axes type: under shard_map(check_vma=True) a literal
    # zeros init is rejected as unvarying against the varying carry.
    init = cost_sdr[0].astype(jnp.int32) * 0
    # unroll amortizes XLA's per-iteration while-loop overhead over the
    # ~1.2k sequential steps of the horizontal paths.
    _, out = jax.lax.scan(step, init, cost_sdr, unroll=8)
    return out  # [S, R, D] int16


def sgm_aggregate(cost_dhw: jnp.ndarray, p1: int, p2: int, num_paths: int = 4):
    """Sum of 4 directional path aggregations -> [H, W, D] int16.

    int16 is exact: the libSGM normalization bounds each path value by
    C_max + P2 (= 62 + P2), so a 4-path sum stays well under 32767.
    """
    d, h, w = cost_dhw.shape
    chwd = jnp.transpose(cost_dhw, (1, 2, 0))  # [H, W, D]

    # Horizontal paths: scan over W, rest = H.
    cw = jnp.transpose(chwd, (1, 0, 2))  # [W, H, D]
    lr = _aggregate_scan(cw, p1, p2)
    rl = _aggregate_scan(cw[::-1], p1, p2)[::-1]
    s = lr + rl
    s = jnp.transpose(s, (1, 0, 2))  # [H, W, D]

    if num_paths >= 4:
        # Vertical paths: scan over H, rest = W.
        tb = _aggregate_scan(chwd, p1, p2)
        bt = _aggregate_scan(chwd[::-1], p1, p2)[::-1]
        s = s + tb + bt
    return s


def _d_true(d: int, reversed_d: bool):
    """Per-lane TRUE disparity index [1, 1, D] for a (possibly reversed)
    volume.  The Pallas kernels keep d reversed (d' = D-1-d) end-to-end;
    working in that space saves two full-volume flips."""
    didx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    return (d - 1 - didx) if reversed_d else didx


def _shear_w_by_d(vol: jnp.ndarray, base: int, fill, reversed_d: bool):
    """out[h, x, l] = vol[h, x + d_true(l) + base, l] via log-decomposed
    W shifts.

    A data-dependent gather would be pathological on TPU; a shear by the
    per-lane disparity decomposes into log2(D) static shifts selected by
    the bits of d_true — each a full-bandwidth VPU pass over the volume.
    """
    h, w, d = vol.shape
    dt = _d_true(d, reversed_d)

    def shift_w(v, k):
        if k == 0:
            return v
        pad = jnp.full((h, min(k, w), d), fill, v.dtype)
        return jnp.concatenate([v[:, k:, :], pad], axis=1) if k < w else (
            jnp.full_like(v, fill)
        )

    out = shift_w(vol, base)
    k = 1
    while k < d:
        out = jnp.where((dt & k) != 0, shift_w(out, k), out)
        k *= 2
    return out


def _unshear_w_by_d(vol: jnp.ndarray, base: int, fill, reversed_d: bool):
    """out[h, x, l] = vol[h, x - d_true(l) - base, l] (inverse shear)."""
    h, w, d = vol.shape
    dt = _d_true(d, reversed_d)

    def shift_w(v, k):
        if k == 0:
            return v
        pad = jnp.full((h, min(k, w), d), fill, v.dtype)
        return jnp.concatenate([pad, v[:, :-k, :]], axis=1) if k < w else (
            jnp.full_like(v, fill)
        )

    out = shift_w(vol, base)
    k = 1
    while k < d:
        out = jnp.where((dt & k) != 0, shift_w(out, k), out)
        k *= 2
    return out


def _lr_agreement(
    s_hwd: jnp.ndarray, best: jnp.ndarray, min_disparity: int, reversed_d: bool
):
    """Left-right consistency from one aggregated volume, O(log D) passes.

    Right-view WTA: S_right[x, d] = S_left[x + d + minD, d]; left pixel x
    with winner d is kept iff |best_r[x - d - minD] - d| <= 1.
    """
    h, w, d = s_hwd.shape
    big = jnp.array(jnp.iinfo(jnp.int16).max, s_hwd.dtype)
    sheared = _shear_w_by_d(s_hwd, min_disparity, big, reversed_d)
    dt = _d_true(d, reversed_d)
    # Keyed min: value*D + d_true, so the winner AND the lowest-d tie-break
    # come out of ONE reduction (matches argmin-first semantics of the
    # unreversed path).
    key_r = jnp.min(sheared.astype(jnp.int32) * d + dt, axis=-1)
    best_r = key_r % d  # [H, W] right coords, true disparity index

    # Indicator in right coords, then unshear back to left coords: column x
    # at lane l receives I[x - d_true(l) - minD, l] — exactly the right
    # pixel that left pixel x matched at that disparity.
    ind = (jnp.abs(best_r[..., None] - dt) <= 1).astype(jnp.int8)
    ind_left = _unshear_w_by_d(ind, min_disparity, jnp.int8(0), reversed_d)
    agree = jnp.max(
        jnp.where(dt == best[..., None], ind_left, jnp.int8(0)), axis=-1
    )
    return agree > 0


def _wta(
    s_hwd: jnp.ndarray,
    min_disparity: int,
    uniqueness: int,
    subpixel: bool,
    reversed_d: bool = False,
):
    """Winner-take-all with uniqueness test and sub-pixel quadratic fit.

    Works directly on a d-reversed volume (reversed_d=True, the Pallas
    layout) — the winner and its lowest-true-d tie-break come from ONE
    keyed min-reduction (key = S*D + d_true), so no argmin and no flips.

    Returns (disp16 int32 [H,W], best int32 [H,W], valid bool [H,W]).
    Sub-pixel formula follows OpenCV SGBM: delta in [-8, 8] sixteenths.
    """
    d = s_hwd.shape[-1]
    dt = _d_true(d, reversed_d)
    big = jnp.array(jnp.iinfo(jnp.int16).max, s_hwd.dtype)

    key = s_hwd.astype(jnp.int32) * d + dt
    min_key = jnp.min(key, axis=-1)
    best = min_key % d
    min_s = min_key // d

    # Uniqueness (OpenCV SGBM): invalid if some d with |d - best| > 1 has
    # S[d] * (100 - uniq) < minS * 100.
    near = jnp.abs(dt - best[..., None]) <= 1
    second = jnp.min(jnp.where(near, big, s_hwd), axis=-1).astype(jnp.int32)
    unique_ok = second * (100 - uniqueness) >= min_s * 100

    if subpixel:
        # Masked-min selection instead of take_along_axis: per-pixel dynamic
        # gathers are pathological on TPU; a select+reduce re-reads the
        # volume at full VPU bandwidth instead.
        at_m1 = dt == (best[..., None] - 1)
        at_p1 = dt == (best[..., None] + 1)
        sm = jnp.min(jnp.where(at_m1, s_hwd, big), axis=-1).astype(jnp.int32)
        sp = jnp.min(jnp.where(at_p1, s_hwd, big), axis=-1).astype(jnp.int32)
        denom2 = jnp.maximum(sm + sp - 2 * min_s, 1)
        delta = ((sm - sp) * 16 + denom2) // (denom2 * 2)
        delta = jnp.where((best > 0) & (best < d - 1), delta, 0)
    else:
        delta = 0

    disp16 = (best + min_disparity) * 16 + delta
    return disp16, best, unique_ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_disparity",
        "num_disparities",
        "p1",
        "p2",
        "uniqueness",
        "lr_check",
        "subpixel",
        "num_paths",
        "backend",
    ),
)
def sgm_disparity(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    *,
    min_disparity: int = 4,
    num_disparities: int = 256,
    p1: int = 10,
    p2: int = 120,
    uniqueness: int = 12,
    lr_check: bool = True,
    subpixel: bool = True,
    num_paths: int = 4,
    backend: str = "auto",
) -> jnp.ndarray:
    """Full SGM pipeline: gray uint8 pair -> int16 x16 fixed-point disparity.

    Matches the reference module's output contract
    (src/modules/disparity/disparity.cu:49-80): CV_16SC1, value = disparity
    * 16, invalid = -32768.

    backend: 'pallas' (TPU fused kernels, bit-identical to 'xla'), 'xla',
    or 'auto' (pallas on TPU, xla elsewhere).
    """
    if backend == "auto":
        # The pallas kernels are pltpu-specific; any other backend (cpu, gpu,
        # rocm) takes the XLA path.
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    # int16 storage contract: each normalized path value is bounded by
    # C_max + P2 and the XLA path sums 4 of them in int16, so very large
    # P2 would overflow silently (and collide with the 32767 sentinels).
    if p2 > 8000:
        raise ValueError(
            f"p2={p2} breaks the int16 aggregated-volume contract "
            "(4 * (62 + p2) must stay below 32767); use p2 <= 8000"
        )
    if p1 < 0 or p2 < p1:
        raise ValueError(f"need 0 <= p1 <= p2, got p1={p1}, p2={p2}")

    h, w = left_gray.shape
    cl = census_transform(left_gray)
    cr = census_transform(right_gray)
    if backend in ("pallas", "pallas_interpret") and num_paths == 4:
        from .pallas.sgm import sgm_fused_pallas

        # Fused schedule: uint8 path volumes, bottom-up sweep fused with
        # the WTA/LR pipeline (bit-identical to the XLA path below).
        return sgm_fused_pallas(
            cl, cr, min_disparity=min_disparity,
            num_disparities=num_disparities, p1=p1, p2=p2,
            uniqueness=uniqueness, subpixel=subpixel, lr_check=lr_check,
            interpret=backend == "pallas_interpret",
        )

    cost = hamming_cost_volume(cl, cr, min_disparity, num_disparities)
    s = sgm_aggregate(cost, p1, p2, num_paths)  # [H, W, D]

    disp16, best, valid = _wta(s, min_disparity, uniqueness, subpixel)

    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = valid & (cols >= best + min_disparity)

    if lr_check:
        valid = valid & _lr_agreement(s, best, min_disparity, False)

    out = jnp.where(valid, disp16, DISPARITY_INVALID)
    return out.astype(jnp.int16)

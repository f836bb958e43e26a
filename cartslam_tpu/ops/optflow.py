"""Dense optical flow, TPU-native.

The reference uses the NVIDIA hardware optical-flow engine (NVOF 2.0,
src/modules/optflow.cpp:58-70) — fixed-function IP with no TPU equivalent.
This is a pyramidal block-matching flow designed for the same downstream
contract: int16 [H, W, 2] in S10.5 fixed point, flow measured
current -> previous such that prev_pos = cur_pos - flow
(consumed with >> 5 at src/modules/planeseg/planeseg.cu:215-221).

Coarse-to-fine: at each pyramid level the previous image is warped by the
upsampled flow estimate, then a (2r+1)^2 local SAD search (box-filtered
absolute differences — all VPU-friendly dense ops) refines the estimate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean downsample as two banded matmuls.

    The naive reshape(h//2, 2, w//2, 2).mean((1, 3)) forces a lane-
    interleaving relayout copy + a strided reduce on TPU (~0.35 ms per
    full-res image at KITTI geometry — profiled r5); the same contraction
    as [h/2, h] @ x @ [w, w/2] banded 0.5-matrices rides the MXU for
    ~0.01 ms.  Bit-exact vs the reshape path: operands are integer-valued
    u8 images scaled by 4^-level, every product and partial sum is
    exactly representable in f32 (precision=HIGHEST keeps the MXU from
    rounding through bf16)."""
    h, w = x.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (h // 2, h), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h // 2, h), 1)
    ah = jnp.where(ci // 2 == ri, jnp.float32(0.5), 0.0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    aw = jnp.where(ri // 2 == ci, jnp.float32(0.5), 0.0)
    return jnp.dot(
        jnp.dot(ah, x, precision="highest"), aw, precision="highest"
    )


def _box_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    if r <= 3:
        # Direct separable shift-adds: 4r adds beat two cumsums (TPU
        # cumsum is a log-depth shift chain) for the small windows used
        # here, and fuse into the surrounding SAD arithmetic.
        rows = x
        for k in range(1, r + 1):
            rows = rows + _shift(x, -k, 0) + _shift(x, k, 0)
        out = rows
        for k in range(1, r + 1):
            out = out + _shift(rows, 0, -k) + _shift(rows, 0, k)
        return out
    k = 2 * r + 1
    # Edge padding matches the direct path's clamped _shift, so the border
    # convention is radius-independent (ADVICE r3).  The quality harness
    # (tests/test_quality.py EPE gates) runs the default win=2 direct path.
    xp = jnp.pad(x, ((r, r), (r, r)), mode="edge")
    c = jnp.cumsum(xp, axis=0)
    c = jnp.pad(c, ((1, 0), (0, 0)))
    rows = c[k:, :] - c[:-k, :]
    c2 = jnp.cumsum(rows, axis=1)
    c2 = jnp.pad(c2, ((0, 0), (1, 0)))
    return c2[:, k:] - c2[:, :-k]


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[y, x] = in[y + dy, x + dx] with edge clamping."""
    h, w = x.shape
    py, px = abs(dy), abs(dx)
    xp = jnp.pad(x, ((py, py), (px, px)), mode="edge")
    return jax.lax.dynamic_slice(xp, (py + dy, px + dx), (h, w))


def _warp_backward(img: jnp.ndarray, flow: jnp.ndarray,
                   bound: int | None = None) -> jnp.ndarray:
    """Sample img at (p - flow[p]) with nearest-integer, clamped coords.

    With a static displacement `bound` (known from the pyramid's search
    radii), the per-index 2D gather becomes a bounded multi-select warp
    (ops/warp.py) — pure VPU selects, no gather.
    """
    h, w = img.shape
    if bound is not None and jax.default_backend() == "tpu":
        # On TPU the bounded multi-select beats the per-index gather by an
        # order of magnitude; elsewhere the shifted copies only bloat
        # compile time, so the gather path stays.
        from .warp import select_warp_clamped

        fy = jnp.round(flow[..., 1]).astype(jnp.int32)
        fx = jnp.round(flow[..., 0]).astype(jnp.int32)
        return select_warp_clamped(img, fy, fx, bound, bound)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - flow[..., 1]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - flow[..., 0]
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
    return img[yi, xi]


def _median3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 median via a 19-exchange sorting network (edge-clamped).

    Pure min/max VPU chains — no gathers, no sorts.  Used to regularize
    the per-level flow field: an ambiguous SAD window (flat region,
    repeated texture) yields an isolated outlier vector that would
    DOUBLE at every pyramid upsample; the median kills it while leaving
    majority-correct neighborhoods untouched (the role NVOF's internal
    smoothness term plays, src/modules/optflow.cpp:58-70)."""
    p = [
        _shift(x, dy, dx)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]

    def s(i, j):
        lo = jnp.minimum(p[i], p[j])
        hi = jnp.maximum(p[i], p[j])
        p[i], p[j] = lo, hi

    # Smith's median-of-9 network; the median lands in p[4].
    s(1, 2); s(4, 5); s(7, 8); s(0, 1); s(3, 4); s(6, 7)
    s(1, 2); s(4, 5); s(7, 8); s(0, 3); s(5, 8); s(4, 7)
    s(3, 6); s(1, 4); s(2, 5); s(4, 7); s(4, 2); s(6, 4)
    s(4, 2)
    return p[4]


def _search_level(cur, prev_warped, radius: int, win: int):
    """Best (dx, dy) in [-radius, radius]^2 per pixel by windowed SAD.

    TPU: fully unrolled — the (2r+1)^2 shift/SAD/select chain fuses into
    a handful of VPU loops.  Other backends (the CPU test/dryrun mesh):
    a `lax.scan` over the candidate list — XLA:CPU's compile time is
    superlinear in graph size and the unrolled form alone costs minutes
    (round-4 finding); the scan body compiles once.  Both paths visit
    candidates in the same order with strict-< acceptance, so results
    are identical.
    """
    if jax.default_backend() != "tpu":
        return _search_level_scan(cur, prev_warped, radius, win)
    best_cost = None
    best_dx = jnp.zeros(cur.shape, jnp.float32)
    best_dy = jnp.zeros(cur.shape, jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            cand = _shift(prev_warped, -dy, -dx)  # prev sampled at p - d
            cost = _box_sum(jnp.abs(cur - cand), win)
            # Slight zero-motion bias stabilizes flat regions.
            cost = cost + 0.01 * (abs(dx) + abs(dy))
            if best_cost is None:
                best_cost = cost
                best_dx = jnp.full(cur.shape, float(dx))
                best_dy = jnp.full(cur.shape, float(dy))
            else:
                take = cost < best_cost
                best_cost = jnp.where(take, cost, best_cost)
                best_dx = jnp.where(take, float(dx), best_dx)
                best_dy = jnp.where(take, float(dy), best_dy)
    return best_dx, best_dy


def _search_level_scan(cur, prev_warped, radius: int, win: int):
    """Scan-form of `_search_level` (identical results, tiny compile)."""
    offs = jnp.asarray(
        [
            (dy, dx)
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
        ],
        jnp.int32,
    )
    pad = jnp.pad(
        prev_warped, ((radius, radius), (radius, radius)), mode="edge"
    )

    def body(carry, off):
        best_cost, best_dx, best_dy = carry
        dy, dx = off[0], off[1]
        # in[y - dy, x - dx] with edge clamp == _shift(prev, -dy, -dx)
        cand = jax.lax.dynamic_slice(
            pad, (radius - dy, radius - dx), cur.shape
        )
        cost = _box_sum(jnp.abs(cur - cand), win)
        cost = cost + 0.01 * (jnp.abs(dx) + jnp.abs(dy)).astype(jnp.float32)
        take = cost < best_cost
        return (
            jnp.where(take, cost, best_cost),
            jnp.where(take, dx.astype(jnp.float32), best_dx),
            jnp.where(take, dy.astype(jnp.float32), best_dy),
        ), None

    # cur*0 (not literal zeros) so the init inherits cur's varying-
    # manual-axes type under shard_map(check_vma=True).
    zero = cur * 0
    init = (zero + jnp.inf, zero, zero)
    (_, best_dx, best_dy), _ = jax.lax.scan(body, init, offs)
    return best_dx, best_dy


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "search", "refine", "win", "base_level", "fine_refine",
        "med_passes",
    ),
)
def dense_flow(
    cur_gray: jnp.ndarray,
    prev_gray: jnp.ndarray,
    *,
    levels: int = 4,
    search: int = 4,
    refine: int = 2,
    win: int = 2,
    base_level: int = 1,
    fine_refine: int = 1,
    med_passes: int = 2,
) -> jnp.ndarray:
    """Gray uint8 pair -> float32 flow [H, W, 2] (x, y), current->previous.

    base_level: finest pyramid level actually searched; the result is
    upsampled to full resolution.  1 (default) computes at half resolution
    — ~4x cheaper per level with endpoint error still well under 1 px on
    the quality harness (the downstream consumer warps by INTEGER pixels,
    planeseg.cu:215-221, so sub-pixel sharpness is not load-bearing).
    med_passes: 3x3 median-filter passes applied to the accumulated flow
    after each level — regularizes ambiguous matches on natural imagery
    (measured on a photo pan: median EPE 2.0 -> 0.0 px at the defaults).
    """
    h, w = cur_gray.shape
    m = 1 << (levels - 1)
    ph, pw = (-h) % m, (-w) % m
    cur = jnp.pad(cur_gray.astype(jnp.float32), ((0, ph), (0, pw)), mode="edge")
    prev = jnp.pad(prev_gray.astype(jnp.float32), ((0, ph), (0, pw)), mode="edge")

    curs, prevs = [cur], [prev]
    for _ in range(levels - 1):
        curs.append(_avg_pool2(curs[-1]))
        prevs.append(_avg_pool2(prevs[-1]))

    flow = jnp.zeros((*curs[-1].shape, 2), jnp.float32)
    bound = 0  # static bound on |flow| components at each level
    for lvl in range(levels - 1, base_level - 1, -1):
        c, p = curs[lvl], prevs[lvl]
        if lvl != levels - 1:
            flow = 2.0 * jnp.repeat(jnp.repeat(flow, 2, axis=0), 2, axis=1)
            flow = flow[: c.shape[0], : c.shape[1]]
            bound *= 2
        # Coarsest level: full search; intermediate: refine; the finest
        # searched level only corrects upsampling error (+-1 px suffices —
        # EPE-gated in tests/test_quality.py).
        if lvl == levels - 1:
            radius = search
        elif lvl == base_level:
            radius = fine_refine
        else:
            radius = refine
        # At the coarsest level flow is identically zero: skip the warp.
        pw_img = p if bound == 0 else _warp_backward(p, flow, bound=bound)
        dx, dy = _search_level(c, pw_img, radius, win)
        flow = flow + jnp.stack([dx, dy], axis=-1)
        # Median-regularize the accumulated field: isolated bad matches
        # (flat/ambiguous windows) must not survive to be doubled by the
        # next upsample.  Median of in-range values stays in range, so
        # flow_bound() is unaffected.
        for _ in range(med_passes):
            flow = jnp.stack(
                [_median3x3(flow[..., 0]), _median3x3(flow[..., 1])],
                axis=-1,
            )
        bound += radius

    for _ in range(base_level):
        flow = 2.0 * jnp.repeat(jnp.repeat(flow, 2, axis=0), 2, axis=1)
    return flow[:h, :w]


def flow_bound(
    levels: int = 4,
    search: int = 4,
    refine: int = 2,
    base_level: int = 1,
    fine_refine: int = 1,
) -> int:
    """Static bound on |flow| components at FULL resolution.

    Mirrors the per-level accumulation in `dense_flow` (42 px for the
    defaults).  Consumers that bound warps (e.g. the 'select' temporal
    vote's max_warp_y) drop displacements beyond their bound; compare
    against this to know whether that can happen (ADVICE r3).
    """
    bound = 0
    for lvl in range(levels - 1, base_level - 1, -1):
        if lvl != levels - 1:
            bound *= 2
        if lvl == levels - 1:
            bound += search
        elif lvl == base_level:
            bound += fine_refine
        else:
            bound += refine
    return bound << base_level


def to_s10_5(flow: jnp.ndarray) -> jnp.ndarray:
    """float flow -> int16 S10.5 fixed point (x32), the NVOF output format."""
    return jnp.clip(jnp.round(flow * 32.0), -32768, 32767).astype(jnp.int16)

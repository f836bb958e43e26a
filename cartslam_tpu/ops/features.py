"""ORB-style feature detection, TPU-native: FAST-9 corners + rotated BRIEF.

The reference uses cv::cuda::ORB with 5000 keypoints
(src/modules/features.cpp:8,48-66); features are detected but unused
downstream (no matcher/pose).  This implementation keeps static shapes: a
fixed top-K of NMS'd FAST corners (invalid slots masked), orientation by
intensity centroid, and a 256-bit rotated-BRIEF descriptor packed into 8
uint32 words.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (FAST-9/16), standard order.
_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    np.int32,
)

_PATCH = 31  # BRIEF sampling patch
_HALF = _PATCH // 2


def _brief_pattern(seed: int = 7, n: int = 256) -> np.ndarray:
    """[n, 4] (x1, y1, x2, y2) gaussian test pattern inside the patch."""
    rng = np.random.RandomState(seed)
    pts = np.clip(
        np.round(rng.randn(n, 4) * _PATCH / 5.0), -_HALF + 1, _HALF - 1
    ).astype(np.int32)
    return pts


_PATTERN = _brief_pattern()


def _shift(x, dy, dx):
    h, w = x.shape
    py, px = abs(dy), abs(dx)
    xp = jnp.pad(x, ((py, py), (px, px)), mode="edge")
    return jax.lax.dynamic_slice(xp, (py + dy, px + dx), (h, w))


def fast_score(gray: jnp.ndarray, threshold: int = 20) -> jnp.ndarray:
    """FAST-9/16 corner score map (0 where not a corner)."""
    g = gray.astype(jnp.int32)
    ring = jnp.stack([_shift(g, int(dy), int(dx)) for dx, dy in _CIRCLE], 0)  # [16,H,W]
    bright = ring > (g + threshold)[None]
    dark = ring < (g - threshold)[None]

    def has_run9(mask):
        dbl = jnp.concatenate([mask, mask], axis=0)  # circular
        out = jnp.zeros(gray.shape, bool)
        for s in range(16):
            run = dbl[s]
            for k in range(1, 9):
                run = run & dbl[s + k]
            out = out | run
        return out

    corner = has_run9(bright) | has_run9(dark)
    score = jnp.sum(
        jnp.maximum(jnp.abs(ring - g[None]) - threshold, 0), axis=0
    )
    return jnp.where(corner, score, 0)


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    m = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, _shift(score, dy, dx))
    return jnp.where(score >= m, score, 0)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def detect_orb(gray: jnp.ndarray, max_keypoints: int = 5000, threshold: int = 20):
    """Returns (keypoints [K, 3] float32 (x, y, score; score<=0 = invalid),
    descriptors [K, 8] uint32)."""
    h, w = gray.shape
    score = _nms3(fast_score(gray, threshold))
    # Exclude the border where descriptor patches would leave the image.
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (ys >= _HALF) & (ys < h - _HALF) & (xs >= _HALF) & (xs < w - _HALF)
    score = jnp.where(inb, score, 0)

    top, idx = jax.lax.top_k(score.reshape(-1), max_keypoints)
    ky = idx // w
    kx = idx % w
    valid = top > 0

    gpad = jnp.pad(gray.astype(jnp.float32), _HALF, mode="edge")

    def descriptor(y, x):
        patch = jax.lax.dynamic_slice(gpad, (y, x), (_PATCH, _PATCH))
        # Orientation: intensity centroid (circular-ish via full patch).
        ys2 = jnp.arange(_PATCH, dtype=jnp.float32) - _HALF
        m10 = jnp.sum(patch * ys2[None, :])
        m01 = jnp.sum(patch * ys2[:, None])
        angle = jnp.arctan2(m01, m10)
        ca, sa = jnp.cos(angle), jnp.sin(angle)

        def sample(px, py):
            rx = jnp.round(ca * px - sa * py).astype(jnp.int32) + _HALF
            ry = jnp.round(sa * px + ca * py).astype(jnp.int32) + _HALF
            rx = jnp.clip(rx, 0, _PATCH - 1)
            ry = jnp.clip(ry, 0, _PATCH - 1)
            return patch[ry, rx]

        p = jnp.asarray(_PATTERN)
        v1 = sample(p[:, 0].astype(jnp.float32), p[:, 1].astype(jnp.float32))
        v2 = sample(p[:, 2].astype(jnp.float32), p[:, 3].astype(jnp.float32))
        bits = (v1 < v2).astype(jnp.uint32)
        words = bits.reshape(8, 32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(words << shifts[None, :], axis=1, dtype=jnp.uint32)

    desc = jax.vmap(descriptor)(ky, kx)
    kps = jnp.stack(
        [kx.astype(jnp.float32), ky.astype(jnp.float32),
         jnp.where(valid, top.astype(jnp.float32), 0.0)],
        axis=-1,
    )
    return kps, desc


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "threshold", "levels", "scale"),
)
def detect_orb_pyramid(
    gray: jnp.ndarray,
    max_keypoints: int = 5000,
    threshold: int = 20,
    levels: int = 3,
    scale: float = 1.4142135,
):
    """Multi-scale ORB: FAST+rBRIEF per pyramid level, keypoints mapped to
    level-0 coordinates.

    Matches cv::cuda::ORB's scale coverage (the reference detector is
    pyramidal, src/modules/features.cpp:48-66): the keypoint budget splits
    across levels proportionally to level area (OpenCV's
    ORB_Impl::buildScalePyramid distribution).  Returns
    (keypoints [K, 4] float32 (x, y, score, level), descriptors [K, 8]).
    """
    h, w = gray.shape
    areas = np.array([(1.0 / scale) ** (2 * i) for i in range(levels)])
    ks = np.maximum((areas / areas.sum() * max_keypoints).astype(int), 1)
    ks[0] += max_keypoints - int(ks.sum())  # exact total

    g = gray.astype(jnp.float32)
    kps_all, desc_all = [], []
    for lvl in range(levels):
        factor = scale ** lvl
        if lvl == 0:
            gl = gray
        else:
            lh, lw = max(int(round(h / factor)), _PATCH + 2), max(
                int(round(w / factor)), _PATCH + 2
            )
            gl = jnp.clip(
                jnp.round(jax.image.resize(g, (lh, lw), "linear")), 0, 255
            ).astype(jnp.uint8)
        kps, desc = detect_orb(gl, int(ks[lvl]), threshold)
        sx = w / gl.shape[1]
        sy = h / gl.shape[0]
        kps = jnp.concatenate(
            [
                kps[:, :1] * sx,
                kps[:, 1:2] * sy,
                kps[:, 2:3],
                jnp.full((kps.shape[0], 1), float(lvl), jnp.float32),
            ],
            axis=-1,
        )
        # Invalid slots keep score 0 regardless of level column use.
        kps_all.append(kps)
        desc_all.append(desc)
    return jnp.concatenate(kps_all, axis=0), jnp.concatenate(desc_all, axis=0)

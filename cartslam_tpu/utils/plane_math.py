"""Plane fitting math (device + host pieces).

Closed-form least-squares plane from point moments, following the
determinant method the reference borrowed from ilikebigbits.com
(src/utils/plane.cpp:56-97).  Vectorized over labels so all superpixels fit
simultaneously on device — the TPU replacement for the reference's
per-superpixel OpenMP RANSAC loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def plane_from_moments(n, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz):
    """Least-squares plane [a,b,c,d] (unit normal) per label from moments.

    All args are [L]-shaped sums over each label's valid 3D points.
    Returns [L, 4]; rows with n < 3 or degenerate covariance are zeros
    (the reference's null-plane convention, plane.cpp:84-86).
    """
    n_safe = jnp.maximum(n, 1.0)
    cx, cy, cz = sx / n_safe, sy / n_safe, sz / n_safe
    # Central second moments (covariance * n).
    xx = sxx - sx * cx
    xy = sxy - sx * cy
    xz = sxz - sx * cz
    yy = syy - sy * cy
    yz = syz - sy * cz
    zz = szz - sz * cz

    det_x = yy * zz - yz * yz
    det_y = xx * zz - xz * xz
    det_z = xx * yy - xy * xy

    abc_x = jnp.stack([det_x, xz * yz - xy * zz, xy * yz - xz * yy], -1)
    abc_y = jnp.stack([xz * yz - xy * zz, det_y, xy * xz - yz * xx], -1)
    abc_z = jnp.stack([xy * yz - xz * yy, xy * xz - yz * xx, det_z], -1)

    use_x = (det_x > det_y) & (det_x > det_z)
    use_y = (~use_x) & (det_y > det_z)
    abc = jnp.where(
        use_x[..., None], abc_x, jnp.where(use_y[..., None], abc_y, abc_z)
    )

    norm = jnp.linalg.norm(abc, axis=-1)
    degenerate = (jnp.maximum(jnp.maximum(det_x, det_y), det_z) <= 0) | (
        norm == 0
    ) | (n < 3)
    abc = abc / jnp.maximum(norm, 1e-20)[..., None]
    d = -(abc[..., 0] * cx + abc[..., 1] * cy + abc[..., 2] * cz)
    plane = jnp.concatenate([abc, d[..., None]], axis=-1)
    return jnp.where(degenerate[..., None], 0.0, plane)


def label_point_moments(labels, points, valid, num_labels):
    """Per-label moments of valid 3D points via scatter-add.

    labels int [H,W]; points float [H,W,3]; valid bool [H,W].
    Returns dict of [L] arrays: n, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz.
    """
    flat = labels.reshape(-1)
    p = points.reshape(-1, 3).astype(jnp.float32)
    # Non-finite points are real (reprojection at disparity 0, ZED inf fill);
    # inf * 0-weight = NaN would poison the label's moments, so exclude them
    # from validity and zero the coordinates before accumulating.
    finite = jnp.isfinite(p).all(axis=-1)
    w = (valid.reshape(-1) & finite).astype(jnp.float32)
    p = jnp.where(finite[:, None], p, 0.0)
    x, y, z = p.T

    def acc(v):
        return jnp.zeros((num_labels,), jnp.float32).at[flat].add(v * w)

    return dict(
        n=acc(jnp.ones_like(w)),
        sx=acc(x), sy=acc(y), sz=acc(z),
        sxx=acc(x * x), sxy=acc(x * y), sxz=acc(x * z),
        syy=acc(y * y), syz=acc(y * z), szz=acc(z * z),
    )


def fit_label_planes(labels, points, valid, num_labels):
    """[L, 4] least-squares plane per label over its valid points."""
    m = label_point_moments(labels, points, valid, num_labels)
    return plane_from_moments(
        m["n"], m["sx"], m["sy"], m["sz"],
        m["sxx"], m["sxy"], m["sxz"], m["syy"], m["syz"], m["szz"],
    ), m["n"]


def _plane_from_3pts(p0, p1, p2):
    """Plane [*, 4] (unit normal) through 3 points; zeros when collinear."""
    n = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nn = n / jnp.maximum(norm, 1e-20)
    d = -jnp.sum(nn * p0, axis=-1, keepdims=True)
    plane = jnp.concatenate([nn, d], axis=-1)
    return jnp.where(norm > 1e-12, plane, 0.0)


def label_point_table(labels, points, valid, num_labels, sample_k):
    """Up to `sample_k` valid 3D points per label: [L, K, 3] + counts [L].

    One device sort groups pixels by label (random-keyed within a label so
    the K kept points are a uniform sample); per-label offsets come from a
    searchsorted, then one [L, K] gather reads the table.  This is the
    static-shape replacement for the reference's ragged per-superpixel
    point vectors (planefit.cu:369-381).
    """
    n = labels.size
    flat_lab = labels.reshape(-1)
    p = points.reshape(-1, 3).astype(jnp.float32)
    finite = jnp.isfinite(p).all(axis=-1)
    ok = valid.reshape(-1) & finite
    # Invalid pixels sort to a sentinel label past the end.
    lab = jnp.where(ok, flat_lab, num_labels)
    mix = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 20)
    order = jnp.lexsort((mix, lab))
    lab_sorted = lab[order]

    starts = jnp.searchsorted(lab_sorted, jnp.arange(num_labels + 1))
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    idx = jnp.minimum(
        starts[:-1, None] + jnp.arange(sample_k)[None, :], n - 1
    )
    slot_valid = jnp.arange(sample_k)[None, :] < counts[:, None]
    pix = order[idx]  # [L, K] pixel ids
    table = jnp.where(slot_valid[..., None], p[pix], 0.0)
    return table, counts


def ransac_label_planes(
    labels,
    points,
    valid,
    num_labels,
    *,
    hypotheses: int = 16,
    sample_k: int = 64,
    threshold: float = 0.02,
    min_points: int = 3,
    seed: int = 0,
):
    """Per-label RANSAC plane fit, fully vectorized (all labels x all
    hypotheses at once).

    The TPU mapping of util::segmentPlane (plane.cpp:99-180): H independent
    3-point hypotheses per label (vmapped), inliers scored on the label's
    K-point sample table, winner refit with the closed-form moment solve
    over ALL of the label's inlier pixels.  The reference's probabilistic
    early break becomes a fixed hypothesis budget (static shapes).

    Returns ([L, 4] planes, [L] valid-point counts).
    """
    table, counts = label_point_table(labels, points, valid, num_labels, sample_k)
    kmax = jnp.maximum(jnp.minimum(counts, sample_k), 1)

    def one_hypothesis(hkey):
        # Three DISTINCT sample indices per label via the shifted-rank trick
        # (uniform without replacement), mirroring the reference's
        # RandomSampler unique-index contract (src/utils/random.cpp:4-23).
        r = jax.random.randint(hkey, (num_labels, 3), 0, 1 << 30)
        a = r[:, 0] % kmax
        b = r[:, 1] % jnp.maximum(kmax - 1, 1)
        b = b + (b >= a)
        c = r[:, 2] % jnp.maximum(kmax - 2, 1)
        c = c + (c >= jnp.minimum(a, b))
        c = c + (c >= jnp.maximum(a, b))
        sel = jnp.stack([a, b, c], axis=-1) % kmax[:, None]
        pts = jnp.take_along_axis(table, sel[..., None], axis=1)  # [L, 3, 3]
        plane = _plane_from_3pts(pts[:, 0], pts[:, 1], pts[:, 2])  # [L, 4]
        dist = jnp.abs(
            jnp.einsum("lkc,lc->lk", table, plane[:, :3]) + plane[:, 3:4]
        )
        slot = jnp.arange(sample_k)[None, :] < counts[:, None]
        score = jnp.sum((dist < threshold) & slot, axis=1)
        # A degenerate (collinear/duplicate-sample) hypothesis is the zero
        # plane whose distance is 0 everywhere — it would beat every real
        # plane in argmax.  The reference skips zero-norm models outright
        # (plane.cpp:140-142); mask them out of the selection.
        nondeg = jnp.linalg.norm(plane[:, :3], axis=-1) > 1e-12
        return plane, jnp.where(nondeg, score, -1)

    keys = jax.random.split(jax.random.PRNGKey(seed), hypotheses)
    planes_h, scores_h = jax.vmap(one_hypothesis)(keys)  # [H, L, 4], [H, L]
    best_h = jnp.argmax(scores_h, axis=0)  # [L]
    best_plane = jnp.take_along_axis(
        planes_h,
        jnp.broadcast_to(best_h[None, :, None], (1, num_labels, 4)),
        axis=0,
    )[0]  # [L, 4]

    # Final refit on inliers over ALL pixels (plane.cpp:163-180): restrict
    # validity to points within `threshold` of the winning hypothesis.
    two_rows = jnp.concatenate([best_plane.T, best_plane.T], axis=0)  # fast path
    per_pix_plane = jnp.take(two_rows, labels, axis=1)[:4]  # [4, H, W]
    pf = points.astype(jnp.float32)
    dist = jnp.abs(
        jnp.einsum("hwc,chw->hw", pf, per_pix_plane[:3]) + per_pix_plane[3]
    )
    degenerate = jnp.linalg.norm(best_plane[:, :3], axis=-1) < 1e-6
    inlier = valid & (dist < threshold) & ~degenerate[labels]
    # The refit keeps the covariance method's own orientation — consistent
    # across labels, exactly like the reference's final
    # getPlaneFromPoints(inliers) refit (plane.cpp:163-180); matching the
    # random 3-point winding instead would randomize normal signs and
    # fragment downstream orientation clustering.
    refit, n_in = fit_label_planes(labels, points, inlier, num_labels)
    ok = (counts >= min_points) & (n_in >= 3) & ~degenerate
    return jnp.where(ok[:, None], refit, 0.0), counts


def count_plane_inliers_per_label(labels, points, valid, planes, num_labels, threshold):
    """Inlier counts [P, L]: per plane, per label, valid points within
    `threshold` of the plane (calculateRegionDistance, planefit.cu:84-138)."""
    p = points.reshape(-1, 3).astype(jnp.float32)
    flat = labels.reshape(-1)
    w = valid.reshape(-1)

    def per_plane(plane):
        a = plane[:3]
        denom = jnp.maximum(jnp.linalg.norm(a), 1e-20)
        dist = jnp.abs(p @ a + plane[3]) / denom
        inl = (dist < threshold) & w
        return jnp.zeros((num_labels,), jnp.int32).at[flat].add(inl.astype(jnp.int32))

    return jax.vmap(per_plane)(planes)

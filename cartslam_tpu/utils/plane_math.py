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

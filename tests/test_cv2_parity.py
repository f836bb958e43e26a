"""External correctness anchors against OpenCV (VERDICT r2 item 5).

The quality gates elsewhere compare against the synthetic source's own
ground truth; these tests anchor the core geometry ops against the
reference's algorithm family (cv::cuda::StereoSGM ~ cv2.StereoSGBM,
cv::cuda::reprojectImageTo3D ~ cv2.reprojectImageTo3D) and run the SGM on
a REAL photograph (matplotlib's grace_hopper sample) so the census/SGM
path is exercised on natural texture, not only procedural noise.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from cartslam_tpu.ops import depth as depth_ops
from cartslam_tpu.ops import stereo


def _natural_image(h, w):
    """Grayscale crop of a real photograph (matplotlib sample data)."""
    import matplotlib

    path = matplotlib.cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    assert img is not None
    img = cv2.resize(img, (w * 2, h * 2), interpolation=cv2.INTER_AREA)
    return img[h // 2 : h // 2 + h, w // 2 : w // 2 + w]


def _shift_pair(left, gt_disp):
    """Right view: left warped by the ground-truth disparity (backward
    sampling right[x] = left[x - (-d)]... right[y, x] = left[y, x + d] is
    wrong-way; proper: left[y, x] = right[y, x - d], so build right by
    forward-resampling: right[y, x] = left[y, x + d_right]; with a smooth
    d this inverse-warp approximation is accurate away from occlusions."""
    h, w = left.shape
    xs = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    ys = np.arange(h, dtype=np.float32)[:, None].repeat(w, 1)
    right = cv2.remap(
        left.astype(np.float32), xs + gt_disp, ys, cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REPLICATE,
    )
    return np.clip(np.round(right), 0, 255).astype(np.uint8)


def test_depth_matches_cv2_reproject():
    rng = np.random.RandomState(0)
    h, w = 48, 64
    disp16 = (rng.randint(16, 60 * 16, (h, w))).astype(np.int16)
    q = np.array(
        [[1, 0, 0, -31.5],
         [0, 1, 0, -23.5],
         [0, 0, 0, 700.0],
         [0, 0, 1 / 0.54, 0]], np.float32,
    )
    ours = np.asarray(depth_ops.reproject_to_3d(jnp.asarray(disp16), jnp.asarray(q)))
    ref = cv2.reprojectImageTo3D(disp16.astype(np.float32) / 16.0, q)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def _run_ours(left, right, min_d, num_d, uniq):
    out = stereo.sgm_disparity(
        jnp.asarray(left), jnp.asarray(right),
        min_disparity=min_d, num_disparities=num_d,
        uniqueness=uniq, backend="xla",
    )
    return np.asarray(out)


def _run_sgbm(left, right, min_d, num_d, uniq):
    sgbm = cv2.StereoSGBM_create(
        minDisparity=min_d, numDisparities=num_d, blockSize=3,
        P1=8 * 9, P2=32 * 9, uniquenessRatio=uniq, disp12MaxDiff=1,
        mode=cv2.STEREO_SGBM_MODE_HH,
    )
    return sgbm.compute(left, right)  # int16 x16, invalid < minDisparity*16


def test_sgm_cross_checks_opencv_sgbm_on_natural_texture():
    """Census-SGM (ours) vs BT-SGBM (OpenCV) on a real photo warped by a
    smooth ground-truth disparity: both must recover the plane, and where
    both are valid they must agree to ~1 px on the vast majority of
    pixels (different cost functions -> tolerance-based parity)."""
    h, w = 128, 192
    left = _natural_image(h, w)
    xs = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    ys = np.arange(h, dtype=np.float32)[:, None].repeat(w, 1)
    gt = 8.0 + 10.0 * xs / w + 6.0 * ys / h  # slanted plane, 8..24 px
    right = _shift_pair(left, gt)

    min_d, num_d, uniq = 0, 48, 10
    ours = _run_ours(left, right, min_d, num_d, uniq)
    ref = _run_sgbm(left, right, min_d, num_d, uniq)

    valid_o = ours != stereo.DISPARITY_INVALID
    valid_r = ref >= 0
    both = valid_o & valid_r
    both[:, :num_d] = False  # left band can't match
    assert both.mean() > 0.5, both.mean()

    diff_px = np.abs(ours[both].astype(np.float64) - ref[both]) / 16.0
    assert (diff_px <= 1.0).mean() > 0.9, (diff_px <= 1.0).mean()

    # And both against the actual ground truth.  The disparity OBSERVED at
    # left pixel X solves d = gt(X - d) (the pair was built by sampling
    # left at x + gt(x)); resolve the slant fixed point before comparing.
    d_star = gt.copy()
    for _ in range(20):
        xi = np.clip(xs - d_star, 0, w - 1)
        d_star = 8.0 + 10.0 * xi / w + 6.0 * ys / h
    gt16 = d_star * 16
    err_ours = np.abs(ours[both] - gt16[both]) / 16.0
    err_ref = np.abs(ref[both] - gt16[both]) / 16.0
    assert np.median(err_ours) <= 0.5, np.median(err_ours)
    assert np.median(err_ours) <= np.median(err_ref) + 0.25


def test_flow_cross_checks_farneback_on_natural_pan():
    """Our pyramidal block-matching flow vs cv2.calcOpticalFlowFarneback
    on a real photograph translated by a known (4, 2) px pan (the
    reference's NVOF is a block-matcher of the same family,
    src/modules/optflow.cpp:58-70).

    Gates are distribution-aware: our matcher is LOCAL (no global
    smoothness propagation — the downstream consumer warps integer
    pixels and votes per superpixel, planeseg.cu:215-221), so flat
    photo regions are genuinely ambiguous for it while Farneback's
    polynomial expansion coasts through them.  The pixel-median must
    match Farneback's; the mean over *textured* pixels must be small."""
    from cartslam_tpu.ops import optflow

    h, w = 128, 256
    mx, my = 4, 2
    base = _natural_image(h + 8, w + 16)
    prev = base[4 : 4 + h, 8 : 8 + w]
    cur = base[4 - my : 4 - my + h, 8 - mx : 8 - mx + w]

    ours = np.asarray(
        optflow.dense_flow(jnp.asarray(cur), jnp.asarray(prev))
    )
    fb = cv2.calcOpticalFlowFarneback(
        prev, cur, None, 0.5, 3, 15, 3, 5, 1.2, 0
    )

    interior = np.zeros((h, w), bool)
    interior[12:-12, 12:-12] = True
    gx = cv2.Sobel(cur.astype(np.float32), cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(cur.astype(np.float32), cv2.CV_32F, 0, 1)
    textured = interior & (np.sqrt(gx * gx + gy * gy) > 50)
    assert textured.mean() > 0.2  # the crop must actually have texture

    gt = np.array([mx, my], np.float32)
    epe_ours = np.linalg.norm(ours - gt, axis=-1)
    epe_fb = np.linalg.norm(fb - gt, axis=-1)
    # Majority of ALL pixels recover the pan (median EPE ~0 measured),
    # matching Farneback's median.
    assert np.median(epe_ours[interior]) <= 0.5, np.median(epe_ours[interior])
    assert (
        np.median(epe_ours[interior]) <= np.median(epe_fb[interior]) + 0.5
    )
    # Textured pixels: mean EPE bounded (measured 1.8 px at the flagship
    # half-res config; the tail is repeated-texture ambiguity).
    assert epe_ours[textured].mean() <= 2.5, epe_ours[textured].mean()


def test_sgm_dense_validity_on_natural_texture():
    """On well-textured natural imagery the SGM must produce a dense valid
    field (no synthetic-texture crutch)."""
    h, w = 96, 160
    left = _natural_image(h, w)
    gt = np.full((h, w), 12.0, np.float32)
    right = _shift_pair(left, gt)
    ours = _run_ours(left, right, 0, 32, 10)
    interior = ours[:, 40:]
    valid = interior != stereo.DISPARITY_INVALID
    assert valid.mean() > 0.85, valid.mean()
    err = np.abs(interior[valid] - 12 * 16) / 16.0
    assert np.median(err) < 0.3, np.median(err)

"""Golden tests for color, derivative, depth, interpolation, histogram ops."""

import numpy as np
import pytest
import jax.numpy as jnp

from cartslam_tpu.ops import color, depth, derivative, disparity as dops, planeseg

INVALID = -32768


def test_bgr_to_gray_matches_opencv_weights():
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (255, 0, 0)  # pure blue (BGR)
    img[0, 1] = (0, 255, 0)
    img[1, 0] = (0, 0, 255)
    img[1, 1] = (10, 20, 30)
    g = np.array(color.bgr_to_gray(jnp.array(img)))
    assert g[0, 0] == round(0.114 * 255)
    assert g[0, 1] == round(0.587 * 255)
    assert g[1, 0] == round(0.299 * 255)
    assert g[1, 1] == round(10 * 0.114 + 20 * 0.587 + 30 * 0.299)


def test_bgr_to_ycrcb_centered():
    img = np.full((1, 1, 3), 128, np.uint8)
    out = np.array(color.bgr_to_ycrcb(jnp.array(img)))
    assert tuple(out[0, 0]) == (128, 128, 128)


def test_directional_derivative_values():
    # disparity = 3*y + 10 -> vertical derivative = 3 * 2*offset = 12, horiz 0.
    h, w = 16, 20
    d = (3 * np.arange(h)[:, None] + 10 + np.zeros((h, w))).astype(np.int16)
    deriv, hist = derivative.directional_derivatives(jnp.array(d))
    deriv = np.array(deriv)
    inner = deriv[2:-2, :]
    assert (inner[..., 0] == 12).all()
    assert (deriv[..., 1] == 0).all()
    # Border rows clamp (copyToShared extrapolation): rows 0/15 -> 6,
    # rows 1/14 -> 9.
    assert (deriv[0, :, 0] == 6).all() and (deriv[-1, :, 0] == 6).all()
    assert (deriv[1, :, 0] == 9).all() and (deriv[-2, :, 0] == 9).all()
    hist = np.array(hist)
    assert hist[12 + 128, 0] == (h - 4) * w
    assert hist[6 + 128, 0] == 2 * w
    assert hist[9 + 128, 0] == 2 * w
    assert hist[128, 1] == h * w


def test_derivative_invalid_propagation():
    d = np.full((12, 12), 100, np.int16)
    d[6, 6] = INVALID
    deriv, _ = derivative.directional_derivatives(jnp.array(d))
    deriv = np.array(deriv)
    # vertical derivative invalid where up/down sample is the hole
    assert deriv[4, 6, 0] == INVALID and deriv[8, 6, 0] == INVALID
    assert deriv[6, 4, 1] == INVALID and deriv[6, 8, 1] == INVALID
    assert deriv[5, 5, 0] != INVALID


def test_planeseg_derivative_lowpass():
    h, w = 20, 8
    d = (4 * np.arange(h)[:, None] + np.zeros((h, w))).astype(np.int16)
    deriv, hist = derivative.planeseg_derivative(jnp.array(d))
    deriv = np.array(deriv)
    assert (deriv[4:-4] == 8).all()  # smoothed gradient 4/row, offset +-1 -> 8
    assert np.array(hist)[8 + 128] > 0


def test_depth_reprojection():
    q = np.eye(4, dtype=np.float32)
    q[0, 3], q[1, 3] = -10.0, -5.0
    q[2, 2], q[2, 3] = 0.0, 100.0
    q[3, 2], q[3, 3] = 1.0 / 0.5, 0.0
    d = np.full((8, 16), 8 * 16, np.int16)  # disparity 8 -> z = 100*0.5/8
    xyz = np.array(depth.reproject_to_3d(jnp.array(d), jnp.array(q)))
    assert np.allclose(xyz[..., 2], 100.0 * 0.5 / 8.0, atol=1e-5)
    assert np.allclose(xyz[3, 12, 0], (12 - 10.0) * 0.5 / 8.0, atol=1e-5)
    assert np.allclose(xyz[3, 12, 1], (3 - 5.0) * 0.5 / 8.0, atol=1e-5)


def test_interpolate_fills_and_invalidates():
    d = np.full((24, 24), 160, np.int16)
    d[8:12, 8:12] = INVALID
    out = np.array(
        dops.interpolate(
            jnp.array(d), radius=3, iterations=4, min_disparity=64, max_disparity=1000
        )
    )
    # 4x4 hole is smaller than the 5x5 window: should fully fill to 160.
    assert (out == 160).all()
    # A sparse field (few valid) gets invalidated instead.
    d2 = np.full((24, 24), INVALID, np.int16)
    d2[::6, ::6] = 160
    out2 = np.array(
        dops.interpolate(
            jnp.array(d2), radius=2, iterations=1, min_disparity=64, max_disparity=1000
        )
    )
    assert (out2 == INVALID).all()


def test_classify_ranges_and_order():
    ranges = np.array([[5, 20], [-5, 5]], np.int32)
    d = np.array([[4, 5, 19, 20, -5, -6, INVALID]], np.int16)
    out = np.array(planeseg.classify(jnp.array(d), jnp.array(ranges)))
    #       4->V  5->H  19->H 20->U -5->V -6->U invalid->U
    assert list(out[0]) == [1, 0, 0, 2, 1, 2, 2]


def test_classify_horizontal_priority():
    # Overlapping ranges: horizontal tested first (planeseg.cu:191-195).
    ranges = np.array([[0, 10], [0, 10]], np.int32)
    d = np.array([[3]], np.int16)
    out = np.array(planeseg.classify(jnp.array(d), jnp.array(ranges)))
    assert out[0, 0] == 0


def test_color_conversions_match_opencv():
    """bgr_to_gray / bgr_to_ycrcb vs cv2's converters (the reference feeds
    cv::cvtColor output into SGM and the relaxation)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 48, 3), dtype=np.uint8)

    from cartslam_tpu.ops import color

    gray = np.asarray(color.bgr_to_gray(jnp.asarray(img)))
    ref_gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    assert np.abs(gray.astype(int) - ref_gray.astype(int)).max() <= 1

    ycc = np.asarray(color.bgr_to_ycrcb(jnp.asarray(img)))
    ref_ycc = cv2.cvtColor(img, cv2.COLOR_BGR2YCrCb)
    assert np.abs(ycc.astype(int) - ref_ycc.astype(int)).max() <= 1

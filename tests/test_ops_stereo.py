"""SGM disparity op tests: golden recovery on synthetic stereo."""

import numpy as np
import jax.numpy as jnp
import pytest

from cartslam_tpu.ops import stereo


def make_pair(h, w, d, seed=0):
    rng = np.random.RandomState(seed)
    tex = rng.randint(0, 255, (h, w + d)).astype(np.uint8)
    return tex[:, :w], tex[:, d:]


def test_census_bits_change_with_neighborhood():
    img = np.zeros((12, 16), np.uint8)
    img[6, 8] = 200  # bright pixel: neighbors of (6,8) see a greater value
    c0, c1 = stereo.census_transform(jnp.array(img))
    c0, c1 = np.array(c0), np.array(c1)
    assert c0[6, 8] == 0 and c1[6, 8] == 0  # center sees all-equal (not >)
    assert (np.abs(c0[5:8, 7:10]).sum() + np.abs(c1[5:8, 7:10]).sum()) > 0


def test_sgm_recovers_constant_disparity():
    left, right = make_pair(40, 120, 9)
    out = np.array(
        stereo.sgm_disparity(
            jnp.array(left), jnp.array(right), min_disparity=0, num_disparities=32
        )
    )
    valid = out != stereo.DISPARITY_INVALID
    assert valid.mean() > 0.85
    est = out[valid] / 16.0
    assert (np.abs(est - 9) <= 1).mean() > 0.95


def test_sgm_min_disparity_offset():
    left, right = make_pair(32, 100, 12)
    out = np.array(
        stereo.sgm_disparity(
            jnp.array(left), jnp.array(right), min_disparity=4, num_disparities=16
        )
    )
    valid = out != stereo.DISPARITY_INVALID
    est = out[valid] / 16.0
    assert (np.abs(est - 12) <= 1).mean() > 0.9


def test_sgm_output_contract():
    left, right = make_pair(16, 64, 3)
    out = stereo.sgm_disparity(
        jnp.array(left), jnp.array(right), min_disparity=0, num_disparities=16
    )
    assert out.dtype == jnp.int16
    assert out.shape == (16, 64)


def test_lr_check_kills_occlusions():
    # A vertical texture discontinuity with different disparities creates
    # occluded pixels; LR check should invalidate more than without.
    rng = np.random.RandomState(1)
    h, w = 40, 120
    tex = rng.randint(0, 255, (h, w + 20)).astype(np.uint8)
    left = tex[:, :w].copy()
    right = tex[:, 5:5 + w].copy()
    right[:, 60:] = tex[:, 75:75 + w - 60]  # jump to disparity 15 on the right half
    with_lr = np.array(
        stereo.sgm_disparity(jnp.array(left), jnp.array(right),
                             min_disparity=0, num_disparities=32, lr_check=True)
    )
    without = np.array(
        stereo.sgm_disparity(jnp.array(left), jnp.array(right),
                             min_disparity=0, num_disparities=32, lr_check=False)
    )
    assert (with_lr == stereo.DISPARITY_INVALID).sum() >= (
        without == stereo.DISPARITY_INVALID
    ).sum()

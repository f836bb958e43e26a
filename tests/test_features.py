"""ORB-style feature op tests."""

import numpy as np
import jax.numpy as jnp

from cartslam_tpu.ops.features import detect_orb


def test_fast_detects_corners():
    img = np.full((64, 64), 50, np.uint8)
    img[20:40, 20:40] = 200  # bright square: 4 strong corners
    kps, desc = detect_orb(jnp.array(img), max_keypoints=64, threshold=20)
    kps = np.array(kps)
    valid = kps[kps[:, 2] > 0]
    assert len(valid) >= 4
    corners = {(20, 20), (20, 39), (39, 20), (39, 39)}
    found = 0
    for cy, cx in corners:
        if np.any((np.abs(valid[:, 0] - cx) <= 2) & (np.abs(valid[:, 1] - cy) <= 2)):
            found += 1
    assert found >= 3
    assert desc.shape == (64, 8)


def test_flat_image_no_features():
    # Same shape/params as test_fast_detects_corners to reuse the compile.
    img = np.full((64, 64), 128, np.uint8)
    kps, _ = detect_orb(jnp.array(img), max_keypoints=64, threshold=20)
    assert (np.array(kps)[:, 2] <= 0).all()


def test_descriptors_deterministic():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64)).astype(np.uint8)
    kps1, d1 = detect_orb(jnp.array(img), max_keypoints=64, threshold=20)
    kps2, d2 = detect_orb(jnp.array(img), max_keypoints=64, threshold=20)
    np.testing.assert_array_equal(np.array(d1), np.array(d2))

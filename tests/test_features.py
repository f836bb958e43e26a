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


def test_pyramid_detects_multiscale():
    from cartslam_tpu.ops.features import detect_orb_pyramid

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (96, 128)).astype(np.uint8)
    kps, desc = detect_orb_pyramid(jnp.array(img), max_keypoints=128,
                                   threshold=15, levels=3)
    kps = np.array(kps)
    assert kps.shape == (128, 4) and desc.shape == (128, 8)
    valid = kps[kps[:, 2] > 0]
    assert len(valid) > 30
    # Keypoints exist at more than one pyramid level.
    assert len(np.unique(valid[:, 3])) >= 2
    # Coordinates are in level-0 space.
    assert valid[:, 0].max() < 128 and valid[:, 1].max() < 96

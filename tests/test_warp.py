"""Tests for the bounded multi-select warp and temporal-vote modes."""

import jax.numpy as jnp
import numpy as np

from cartslam_tpu.ops import planeseg as pops
from cartslam_tpu.ops.warp import select_gather_axis, separable_warp


def _ref_warp(img, fy, fx, fill):
    h, w = img.shape
    out = np.full_like(img, fill)
    for y in range(h):
        for x in range(w):
            sy, sx = y - fy[y, x], x - fx[y, x]
            if 0 <= sy < h and 0 <= sx < w:
                out[y, x] = img[sy, sx]
    return out


def test_select_gather_axis_exact():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 1000, (40, 56)).astype(np.int32)
    f = rng.randint(-5, 6, (40, 56)).astype(np.int32)
    got = np.asarray(select_gather_axis(jnp.asarray(img), jnp.asarray(f), 5,
                                        axis=1, fill=-7))
    ref = _ref_warp(img, np.zeros_like(f), f, -7)
    assert np.array_equal(got, ref)
    got0 = np.asarray(select_gather_axis(jnp.asarray(img), jnp.asarray(f), 5,
                                         axis=0, fill=-7))
    ref0 = _ref_warp(img, f, np.zeros_like(f), -7)
    assert np.array_equal(got0, ref0)


def test_separable_warp_matches_gather_on_smooth_flow():
    """Row-constant fy makes the separable pass exact — must equal the
    per-index gather bit for bit."""
    rng = np.random.RandomState(1)
    h, w = 48, 64
    img = rng.randint(0, 255, (h, w)).astype(np.int32)
    fy = np.repeat(rng.randint(-4, 5, (h, 1)), w, axis=1).astype(np.int32)
    fx = rng.randint(-6, 7, (h, w)).astype(np.int32)
    # fx must be sampled at the source row for exact agreement; make fx
    # vary only along x so source row == output row sampling.
    fx = np.repeat(fx[:1], h, axis=0)
    got, _ = separable_warp(jnp.asarray(img), jnp.asarray(fy),
                            jnp.asarray(fx), 8, 8, fill=-1)
    ref = _ref_warp(img, fy, fx, -1)
    assert np.array_equal(np.asarray(got), ref)


def test_select_out_of_range_displacement_is_fill():
    img = jnp.ones((16, 16), jnp.int32)
    f = jnp.full((16, 16), 9, jnp.int32)  # beyond r=4
    out = np.asarray(select_gather_axis(img, f, 4, axis=1, fill=0))
    assert (out == 0).all()


def test_temporal_vote_select_matches_gather_constant_flow():
    rng = np.random.RandomState(2)
    h, w, k = 40, 64, 3
    current = rng.randint(0, 3, (h, w)).astype(np.uint8)
    prev = rng.randint(0, 3, (h, w)).astype(np.uint8)
    state = rng.randint(0, 4, (k, h, w)).astype(np.uint8)
    flow = np.zeros((h, w, 2), np.int16)
    flow[..., 0] = 3 << 5  # 3 px right, S10.5
    flow[..., 1] = -2 << 5

    args = (jnp.asarray(current), jnp.asarray(prev), jnp.asarray(state),
            jnp.asarray(flow))
    v_sel, s_sel = pops.temporal_vote_warped(
        *args, current_weight=2, compare_unknown=True, warp_mode="select")
    v_g, s_g = pops.temporal_vote_warped(
        *args, current_weight=2, compare_unknown=True, warp_mode="gather")
    assert np.array_equal(np.asarray(v_sel), np.asarray(v_g))
    assert np.array_equal(np.asarray(s_sel), np.asarray(s_g))


def test_faithful_temporal_mode_runs():
    """temporal_mode='faithful' (reference semantics, VERDICT r2 item 8)
    must be buildable from config and run through the pipeline."""
    import json
    import os
    import tempfile

    from cartslam_tpu.config.registry import read_system_config

    cfg = {
        "data_source": {"type": "synthetic", "num_frames": 6,
                        "image_size": [64, 96]},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1},
            {"type": "optflow", "levels": 3, "base_level": 0},
            {"type": "disparity_planeseg",
             "use_temporal_smoothing": True,
             "temporal_mode": "faithful",
             "temporal_smoothing_distance": 3,
             "parameter_provider": {"type": "histogram_peak"}},
        ],
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cfg.json")
        with open(p, "w") as f:
            json.dump(cfg, f)
        system = read_system_config(p)
        n = system.run()
    assert n == 6

"""Pallas SGM kernels vs the XLA reference path, interpret mode on CPU.

Regression test for the backward-pass warmup bug: with width % 8 != 0 the
padded columns fed real (nonzero) costs into the carry entering the last
real column, corrupting the final ~P2/P1 columns (KITTI's native 1242 width
hits this).  The padded-column cost is now forced to a uniform constant,
which the recurrence maps to a zero-init equivalent.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cartslam_tpu.ops import stereo
from cartslam_tpu.ops.pallas.sgm import sgm_aggregate_pallas


def _census_pair(h, w, d, seed=0):
    rng = np.random.RandomState(seed)
    tex = rng.randint(0, 255, (h, w + d)).astype(np.uint8)
    left, right = tex[:, d:], tex[:, :w]
    cl = stereo.census_transform(jnp.asarray(left))
    cr = stereo.census_transform(jnp.asarray(right))
    return cl, cr


@pytest.mark.parametrize("w", [60, 64])  # 60 % 8 != 0 exercises the padding
def test_pallas_matches_xla_aggregate(w):
    h, d = 24, 16
    min_d, p1, p2 = 0, 10, 120
    cl, cr = _census_pair(h, w, d)

    cost = stereo.hamming_cost_volume(cl, cr, min_d, d)
    s_xla = np.asarray(stereo.sgm_aggregate(cost, p1, p2, num_paths=4))

    s_pallas = np.asarray(
        sgm_aggregate_pallas(
            cl, cr, min_disparity=min_d, num_disparities=d,
            p1=p1, p2=p2, interpret=True,
        )
    )
    np.testing.assert_array_equal(s_pallas, s_xla)


def test_pallas_matches_xla_with_min_disparity():
    h, w, d = 16, 44, 8  # 44 % 8 != 0
    min_d, p1, p2 = 2, 7, 86
    cl, cr = _census_pair(h, w, d, seed=3)

    cost = stereo.hamming_cost_volume(cl, cr, min_d, d)
    s_xla = np.asarray(stereo.sgm_aggregate(cost, p1, p2, num_paths=4))
    s_pallas = np.asarray(
        sgm_aggregate_pallas(
            cl, cr, min_disparity=min_d, num_disparities=d,
            p1=p1, p2=p2, interpret=True,
        )
    )
    np.testing.assert_array_equal(s_pallas, s_xla)


def test_full_sgm_disparity_pallas_path_matches_xla():
    """End-to-end sgm_disparity: the reversed-d WTA/uniqueness/subpixel/LR
    path over the Pallas volume must equal the unreversed XLA path."""
    h, w, d = 24, 68, 16  # w % 8 != 0
    rng = np.random.RandomState(5)
    tex = rng.randint(0, 255, (h, w + d)).astype(np.uint8)
    left, right = jnp.asarray(tex[:, 7:7 + w]), jnp.asarray(tex[:, :w])

    kw = dict(min_disparity=2, num_disparities=d, uniqueness=12,
              lr_check=True, subpixel=True)
    out_xla = np.asarray(stereo.sgm_disparity(left, right, backend="xla", **kw))
    out_pal = np.asarray(
        stereo.sgm_disparity(left, right, backend="pallas_interpret", **kw)
    )
    np.testing.assert_array_equal(out_pal, out_xla)

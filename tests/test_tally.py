"""Exactness tests for the two-level one-hot tally/gather reductions."""

import jax.numpy as jnp
import numpy as np

from cartslam_tpu.ops.tally import label_tally, table_gather
from cartslam_tpu.ops.pallas.tally import label_tally_pallas


def _ref_tally(lab, vals, L):
    ref = np.zeros((L, vals.shape[1]), np.float64)
    np.add.at(ref, lab, vals)
    return ref


def test_label_tally_exact_vs_scatter():
    rng = np.random.RandomState(0)
    for B, L, C in [(65536, 3328, 7), (10000, 500, 3), (4096, 64, 11)]:
        lab = rng.randint(0, L, B).astype(np.int32)
        vals = rng.randint(0, 256, (B, C)).astype(np.float32)
        got = np.asarray(label_tally(jnp.asarray(lab), jnp.asarray(vals), L))
        assert np.array_equal(_ref_tally(lab, vals, L), got), (B, L, C)


def test_label_tally_pallas_interpret_exact():
    rng = np.random.RandomState(1)
    for B, L, C in [(65536, 3328, 7), (10000, 500, 3), (8192, 64, 50)]:
        lab = rng.randint(0, L, B).astype(np.int32)
        vals = rng.randint(0, 256, (B, C)).astype(np.float32)
        got = np.asarray(
            label_tally_pallas(
                jnp.asarray(lab), jnp.asarray(vals), L, interpret=True
            )
        )
        assert np.array_equal(_ref_tally(lab, vals, L), got), (B, L, C)


def test_label_tally_edge_max_label():
    rng = np.random.RandomState(2)
    B, L, C = 8192, 3328, 5
    lab = np.full(B, L - 1, np.int32)
    vals = rng.randint(0, 256, (B, C)).astype(np.float32)
    got = np.asarray(label_tally(jnp.asarray(lab), jnp.asarray(vals), L))
    assert np.array_equal(_ref_tally(lab, vals, L), got)


def test_moment_tally_pallas_interpret_exact():
    """moment_tally_pallas == the scatter-path init_stats table."""
    from cartslam_tpu.ops import superpixels as spops
    from cartslam_tpu.ops.pallas.tally import moment_tally_pallas

    rng = np.random.RandomState(5)
    for B, L, C in [(65536, 3318, 7), (10000, 500, 3), (4096, 512, 8)]:
        h = 64
        w = B // h
        lab = rng.randint(0, L, (h, w)).astype(np.int32)
        # int16-range values, including negatives (derivatives/coords).
        dat = rng.randint(-3000, 3000, (C, h, w)).astype(np.float32)
        flat = lab.reshape(-1)
        dflat = dat.reshape(C, -1).astype(np.float64)
        ref = np.zeros((1 + 2 * C, L), np.float64)
        np.add.at(ref[0], flat, 1)
        for ch in range(C):
            np.add.at(ref[1 + ch], flat, dflat[ch])
            np.add.at(ref[1 + C + ch], flat, dflat[ch] ** 2)
        got = np.asarray(
            moment_tally_pallas(
                jnp.asarray(lab).reshape(-1),
                jnp.asarray(dat).reshape(C, -1),
                L,
                interpret=True,
            ),
            np.float64,
        )
        # count + sums are exact; sum-of-squares rows round once in the
        # f32 byte-plane combine (same precision as the XLA matmul path).
        np.testing.assert_array_equal(ref[: 1 + C], got[: 1 + C])
        np.testing.assert_allclose(
            ref[1 + C :], got[1 + C :], rtol=2e-7, atol=0
        )


def test_moment_tally_pallas_negative_label_drop():
    """OOB labels remapped to num_labels must not contribute."""
    from cartslam_tpu.ops.pallas.tally import moment_tally_pallas

    rng = np.random.RandomState(6)
    B, L, C = 4096, 100, 2
    lab = rng.randint(0, L + 1, B).astype(np.int32)  # L = dropped sentinel
    dat = rng.randint(-256, 256, (C, B)).astype(np.float32)
    got = np.asarray(
        moment_tally_pallas(
            jnp.asarray(lab), jnp.asarray(dat), L, interpret=True
        )
    )
    keep = lab < L
    ref = np.zeros((1 + 2 * C, L), np.float64)
    np.add.at(ref[0], lab[keep], 1)
    for ch in range(C):
        np.add.at(ref[1 + ch], lab[keep], dat[ch][keep])
        np.add.at(ref[1 + C + ch], lab[keep], dat[ch][keep] ** 2)
    np.testing.assert_array_equal(ref, got.astype(np.float64))


def test_table_gather_exact():
    rng = np.random.RandomState(3)
    for L in [3, 64, 500, 3328]:
        tbl = rng.randint(0, 3, L).astype(np.int32)
        lab = rng.randint(0, L, (120, 130)).astype(np.int32)
        got = np.asarray(table_gather(jnp.asarray(tbl), jnp.asarray(lab)))
        assert np.array_equal(tbl[lab], got), L


def test_vote_tally_pallas_interpret_exact():
    from cartslam_tpu.ops.pallas.tally import vote_tally_pallas

    rng = np.random.RandomState(4)
    for B, L in [(65536, 3328), (10000, 500)]:
        lab = rng.randint(0, L, B).astype(np.int32)
        vote = rng.randint(0, 3, B).astype(np.int32)
        ref = np.zeros((L, 3), np.int64)
        np.add.at(ref, (lab, vote), 1)
        got = np.asarray(
            vote_tally_pallas(
                jnp.asarray(lab), jnp.asarray(vote), L, 3, interpret=True
            )
        )
        assert np.array_equal(ref, got.astype(np.int64)), (B, L)


def test_moment_tally_pallas_channel_bounds_exact():
    """Tight per-channel bounds (fewer byte planes) stay exact: uint8
    image channels, small non-negative coords, full-range derivatives."""
    from cartslam_tpu.ops.pallas.tally import moment_tally_pallas

    rng = np.random.RandomState(7)
    B, L = 16384, 1200
    bounds = ((-32768, 32767), (-32768, 32767),  # derivative-like
              (0, 255), (0, 255), (0, 255),      # image channels
              (0, 2047), (0, 2047))              # coord channels
    cols = [rng.randint(lo, hi + 1, B) for lo, hi in bounds]
    dat = np.stack(cols, axis=0).astype(np.float32)
    lab = rng.randint(0, L, B).astype(np.int32)
    got = np.asarray(
        moment_tally_pallas(
            jnp.asarray(lab), jnp.asarray(dat), L,
            channel_bounds=bounds, interpret=True,
        ),
        np.float64,
    )
    C = len(bounds)
    dflat = dat.astype(np.float64)
    ref = np.zeros((1 + 2 * C, L), np.float64)
    np.add.at(ref[0], lab, 1)
    for ch in range(C):
        np.add.at(ref[1 + ch], lab, dflat[ch])
        np.add.at(ref[1 + C + ch], lab, dflat[ch] ** 2)
    np.testing.assert_array_equal(ref[: 1 + C], got[: 1 + C])
    np.testing.assert_allclose(ref[1 + C:], got[1 + C:], rtol=2e-7, atol=0)

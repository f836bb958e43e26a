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

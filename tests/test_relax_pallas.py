"""Pallas relax-phase kernel vs the jnp path — bit parity in interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from cartslam_tpu.ops import superpixels as spops


def _setup(h=26, w=40, block=6, seed=0):
    rng = np.random.RandomState(seed)
    labels, max_id = spops.block_init_labels(h, w, block, block)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    deriv = rng.randint(-30, 30, (h, w, 2)).astype(np.float32)
    specs = [
        spops.FeatureSpec("gaussian", 1.0, 2),
        spops.FeatureSpec("gaussian", 1.5, 3),
        spops.FeatureSpec("compactness", 0.1, 2, progressive=1.0),
    ]
    return labels, [jnp.asarray(deriv), jnp.asarray(img)], specs, max_id + 1


@pytest.mark.parametrize(
    "phases,stats_refresh",
    [(1, "frame"), (2, "frame"), (1, "phase"), (2, "phase")],
)
def test_relax_pallas_matches_xla(phases, stats_refresh):
    labels, data, specs, num_labels = _setup()
    kw = dict(
        feature_data=data,
        feature_specs=specs,
        num_labels=num_labels,
        iterations=3,
        direct_cost=0.5,
        diagonal_cost=0.3536,
        phases=phases,
        stats_refresh=stats_refresh,
    )
    ref = np.asarray(spops.relax(labels, backend="xla", **kw))
    out = np.asarray(spops.relax(labels, backend="pallas_interpret", **kw))
    np.testing.assert_array_equal(out, ref)
    # sanity: the sweep actually moved boundaries
    assert (ref != np.asarray(labels)).any()


def test_relax_pallas_non_multiple_height():
    """H not divisible by the row band exercises padding + border masks."""
    labels, data, specs, num_labels = _setup(h=21, w=40)
    kw = dict(
        feature_data=data,
        feature_specs=specs,
        num_labels=num_labels,
        iterations=2,
        direct_cost=0.5,
        diagonal_cost=0.3536,
        phases=1,
        stats_refresh="frame",
    )
    ref = np.asarray(spops.relax(labels, backend="xla", **kw))
    out = np.asarray(spops.relax(labels, backend="pallas_interpret", **kw))
    np.testing.assert_array_equal(out, ref)


def test_init_stats_matmul_matches_scatter():
    """The MXU byte-decomposed tally must equal the scatter exactly for
    realistic label sizes (both are exact integer accumulations)."""
    labels, data, specs, num_labels = _setup(h=32, w=48, block=6, seed=4)
    dat = jnp.concatenate(
        [jnp.moveaxis(d, -1, 0) for d in data]
        + [jnp.zeros((2, 32, 48), jnp.float32)],  # coord-like channels
        axis=0,
    )
    # include negative int16-range values
    dat = dat.at[0].set(dat[0] - 120.0)
    a = np.asarray(spops.init_stats(labels, dat, num_labels, use_matmul=False))
    b = np.asarray(spops.init_stats(labels, dat, num_labels, use_matmul=True))
    np.testing.assert_array_equal(a, b)

"""Height-sharded flagship step vs the single-chip pipeline (8-CPU mesh).

VERDICT r2 item 2: the spatial mode must run the FULL flagship chain with
per-chip H/n row shards and agree with the single-chip outputs.  Stages
with exact seam handling (relaxation, derivative, votes) must match
bit-for-bit given identical disparities; the SGM vertical-sweep warmup
apron makes disparity itself agree on (nearly) all pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartslam_tpu.parallel.spatial_flagship import (
    SpatialFlagship, SpatialFlagshipConfig,
)


@pytest.fixture(autouse=True, scope="module")
def _no_compile_cache():
    """Serializing this module's shard_map executables into the persistent
    compile cache segfaults the CPU backend (observed in
    jax compilation_cache.put_executable_and_time); keep these compiles
    session-local.  The cache object is initialized once, so unsetting the
    dir after first use is a no-op — the min-compile-time threshold IS
    consulted at write time, so raise it beyond reach instead."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("spatial",))


def _frames(h, w, n, seed=0):
    from cartslam_tpu.sources.synthetic import SyntheticDataSource

    src = SyntheticDataSource(image_size=(h, w), num_frames=n, seed=seed)
    out = []
    while not src.is_finished():
        f = src.get_next()
        if f is None:
            break
        out.append(f)
    return out


def _single_chip_reference(cfg, frames):
    """Run the same chain unsharded through the ops (n=1 ground truth)."""
    devs = jax.devices()[:1]
    mesh1 = Mesh(np.array(devs), ("spatial",))
    sf = SpatialFlagship(mesh1, cfg)
    step = sf.make_step()
    state = jax.device_put(sf.init_state(), NamedSharding(mesh1, P()))
    params = sf.init_params()
    outs = []
    with mesh1:
        for i, f in enumerate(frames):
            frame = {
                "left": f["left"], "right": f["right"],
                "frame_id": np.int32(i + 1),
            }
            state, out = step(state, frame, params)
            outs.append(jax.device_get(out))
    return outs


def test_spatial_matches_single_chip(mesh):
    """8-way row sharding vs the 1-device run of the same step.

    Measured behavior (see PROGRESS notes): disparity ~99% identical (the
    SGM vertical-sweep warmup apron is approximate), and the tiny
    disparity deltas perturb the GLOBAL label statistics, so superpixels
    drift a few percent; planes stay >99% identical and the psum'd
    histogram within a handful of counts."""
    h, w = 96, 128  # 8 shards of 12 rows
    cfg = SpatialFlagshipConfig(
        height=h, width=w, num_disparities=32, min_disparity=1,
        block_size=8, iterations=4, sgm_halo=12, flow_halo=12,
        max_warp_y=8,
    )
    frames = _frames(h, w, 2)

    ref = _single_chip_reference(cfg, frames)

    sf = SpatialFlagship(mesh, cfg)
    step = sf.make_step()
    shard = NamedSharding(mesh, P("spatial"))
    state = {
        k: jax.device_put(
            v, NamedSharding(mesh, P(None, "spatial"))
            if k == "warp_votes" else shard
        )
        for k, v in sf.init_state().items()
    }
    params = sf.init_params()

    with mesh:
        for i, f in enumerate(frames):
            frame = {
                "left": jax.device_put(f["left"], shard),
                "right": jax.device_put(f["right"], shard),
                "frame_id": np.int32(i + 1),
            }
            state, out = step(state, frame, params)
            got = jax.device_get(out)
            want = ref[i]

            agree = (got["disparity"] == want["disparity"]).mean()
            assert agree > 0.98, (i, agree)
            np.testing.assert_allclose(
                got["disparity_derivative_histogram"].astype(np.int64),
                want["disparity_derivative_histogram"].astype(np.int64),
                atol=int(0.01 * h * w),
            )
            lab_agree = (got["superpixels"] == want["superpixels"]).mean()
            assert lab_agree > 0.95, (i, lab_agree)
            plane_agree = (got["planes"] == want["planes"]).mean()
            assert plane_agree > 0.98, (i, plane_agree)
            un_agree = (
                got["planes_unsmoothed"] == want["planes_unsmoothed"]
            ).mean()
            assert un_agree > 0.99, (i, un_agree)

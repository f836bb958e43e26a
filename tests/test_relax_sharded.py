"""Sharded contour relaxation vs the unsharded op — bit equality.

Round-4 gap closure: 'phase' (reference-faithful) statistics mode,
progressive compactness, and multi-phase checkerboard sweeps all now run
under height sharding.  Each case must be ARRAY-EQUAL to the unsharded op
for the halo depth iterations * phases (label influence moves one row per
phase update; 'phase' mode re-tallies + psums the global moments after
every phase, so shards always relabel from identical statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from cartslam_tpu.ops import superpixels as spops
from cartslam_tpu.parallel.halo import exchange_row_halo

AX = "rows"


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), (AX,))


def _setup(h, w, block=6, seed=3, progressive=0.0):
    rng = np.random.RandomState(seed)
    labels, max_id = spops.block_init_labels(h, w, block, block)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    deriv = rng.randint(-30, 30, (h, w, 2)).astype(np.float32)
    specs = [
        spops.FeatureSpec("gaussian", 1.0, 2),
        spops.FeatureSpec("gaussian", 1.5, 3),
        spops.FeatureSpec("compactness", 0.1, 2, progressive=progressive),
    ]
    return np.asarray(labels), deriv, img, specs, max_id + 1


def _run_sharded(mesh, labels, deriv, img, specs, num_labels,
                 iterations, phases, stats_refresh, backend="auto",
                 check_vma=True):
    h, w = labels.shape
    n = mesh.shape[AX]
    assert h % n == 0
    hl = h // n
    halo = iterations * max(1, phases)
    assert halo <= hl, "halo must fit in one shard"

    def local(lab, dv, im):
        row0 = jax.lax.axis_index(AX) * hl
        lab_ext = exchange_row_halo(lab, halo, halo, AX, fill=-1)
        dv_ext = exchange_row_halo(dv, halo, halo, AX)
        im_ext = exchange_row_halo(im, halo, halo, AX)
        out = spops.relax(
            lab_ext, [dv_ext, im_ext], specs, num_labels, iterations,
            0.5, 0.3536, phases=phases, stats_refresh=stats_refresh,
            backend=backend,
            axis_name=AX, row_offset=row0 - halo, global_h=h,
            halo_rows=(halo, halo),
        )
        return out[halo:-halo]

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AX), P(AX), P(AX)), out_specs=P(AX),
        check_vma=check_vma,
    ))
    return np.asarray(fn(
        jnp.asarray(labels), jnp.asarray(deriv), jnp.asarray(img)
    ))


@pytest.mark.parametrize(
    "phases,stats_refresh,progressive",
    [
        (1, "phase", 0.0),   # reference-faithful stats under sharding
        (1, "frame", 1.0),   # progressive compactness under sharding
        (2, "phase", 1.0),   # multi-phase parity + both of the above
    ],
)
def test_sharded_relax_bit_equal(mesh, phases, stats_refresh, progressive):
    h, w = 64, 48  # 8 shards of 8 rows
    iterations = 2
    labels, deriv, img, specs, num_labels = _setup(
        h, w, progressive=progressive
    )
    ref = np.asarray(spops.relax(
        jnp.asarray(labels), [jnp.asarray(deriv), jnp.asarray(img)],
        specs, num_labels, iterations, 0.5, 0.3536,
        phases=phases, stats_refresh=stats_refresh,
    ))
    got = _run_sharded(
        mesh, labels, deriv, img, specs, num_labels,
        iterations, phases, stats_refresh,
    )
    np.testing.assert_array_equal(got, ref)
    assert (ref != labels).any()  # the sweep moved boundaries


def test_sharded_relax_pallas_path_bit_equal(mesh):
    """The TPU spatial mode takes the PALLAS relax path inside shard_map;
    interpret mode covers that path's sharding machinery on CPU — the SMEM
    row0 scalar must put the progressive factor and the multi-phase
    checkerboard parity on GLOBAL rows, and the carried stat image must
    respect halo OOB freezing — bit-equal to the unsharded XLA op."""
    h, w = 64, 48
    iterations, phases = 2, 2
    labels, deriv, img, specs, num_labels = _setup(h, w, progressive=1.0)
    ref = np.asarray(spops.relax(
        jnp.asarray(labels), [jnp.asarray(deriv), jnp.asarray(img)],
        specs, num_labels, iterations, 0.5, 0.3536,
        phases=phases, stats_refresh="frame",
    ))
    # check_vma=False HERE ONLY: interpret mode discharges the kernel into
    # jax ops whose internal dynamic_slices mix varying block data with
    # unvarying loop scalars (a jax-internal interpreter limitation); the
    # COMPILED path keeps check_vma=True — pallas_call is opaque there and
    # declares its varying type via the out_shape vma (ops/pallas/relax.py).
    got = _run_sharded(
        mesh, labels, deriv, img, specs, num_labels,
        iterations, phases, "frame", backend="pallas_interpret",
        check_vma=False,
    )
    np.testing.assert_array_equal(got, ref)


def test_spatial_mode_faithful_knobs_config_reachable(mesh, tmp_path):
    """The r4-closed sharding gaps are reachable from one JSON config:
    stats_refresh='phase', relax_phases=2 and progressive compactness all
    thread through the registry into the spatial step and run."""
    import json

    from cartslam_tpu.config.registry import read_system_config
    from cartslam_tpu.parallel.spatial_flagship import SpatialPipeline

    h, w = 96, 128
    config = {
        "data_source": {
            "type": "synthetic", "image_size": [h, w], "num_frames": 2,
        },
        "parallel": {"mode": "spatial", "devices": 8},
        "modules": [
            {"type": "disparity", "num_disparities": 32, "min_disparity": 1},
            {"type": "disparity_derivative"},
            {"type": "superpixels", "block_size": 8, "iterations": 2,
             "initial_iterations": 3, "stats_refresh": "phase",
             "relax_phases": 2, "progressive_compactness_cost": 1.0},
            {"type": "superpixel_disparity_planeseg",
             "parameter_provider": {
                 "type": "static",
                 "horizontal_range_min": 3, "horizontal_range_max": 40,
                 "vertical_range_min": -6, "vertical_range_max": 3,
             }},
        ],
    }
    path = tmp_path / "spatial_faithful.json"
    path.write_text(json.dumps(config))
    system = read_system_config(str(path), extra_fetch_keys=["superpixels"])
    assert isinstance(system.pipeline, SpatialPipeline)
    from cartslam_tpu.models.superpixels import SuperPixelModule

    sup = [m for m in system.pipeline.modules
           if isinstance(m, SuperPixelModule)][0]
    assert sup.stats_refresh == "phase"
    assert sup.relax_phases == 2
    assert sup.progressive_compactness_cost == 1.0
    n = system.run()
    assert n == 2
    assert system.failed_frames == []

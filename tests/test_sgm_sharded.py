"""Height-sharded SGM vs the full-frame op — bit equality per shard count.

parallel/sgm_sharded.py claims exactness for ANY shard count (split-scan
carry hand-off: shard 0's top-down sweep is exact by construction, each
following shard re-sweeps from its predecessor's ppermuted final carry).
The spatial-flagship pipeline test gates the 8-way case through the whole
chain; this file gates the SGM op directly across shard counts, including
the n=1 degenerate mesh and a shard height smaller than the census halo's
reach.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartslam_tpu.ops import stereo
from cartslam_tpu.parallel.sgm_sharded import sgm_disparity_sharded

AX = "spatial"


def _stereo_pair(h, w, max_disp=20.0, seed=0):
    from cartslam_tpu.sources.synthetic import SyntheticDataSource

    src = SyntheticDataSource(
        image_size=(h, w), num_frames=1, seed=seed,
        max_disparity=max_disp, baseline=8.0,
    )
    f = src.get_next()
    from cartslam_tpu.ops import color

    to_gray = jax.jit(color.bgr_to_gray)
    return np.asarray(to_gray(f["left"])), np.asarray(to_gray(f["right"]))


KW = dict(min_disparity=1, num_disparities=32, p1=10, p2=120, uniqueness=12)


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_sgm_sharded_bit_equal_any_shard_count(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    h, w = 48, 128  # 8 shards of 6 rows: h_local < SGM's vertical reach
    gl, gr = _stereo_pair(h, w)

    want = np.asarray(
        jax.jit(
            functools.partial(stereo.sgm_disparity, backend="xla", **KW)
        )(gl, gr)
    )

    mesh = Mesh(np.array(devs[:n]), (AX,))
    shard = NamedSharding(mesh, P(AX))

    local = functools.partial(sgm_disparity_sharded, axis_name=AX, **KW)
    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P(AX), P(AX)), out_specs=P(AX)
        )
    )
    got = np.asarray(fn(jax.device_put(gl, shard), jax.device_put(gr, shard)))
    np.testing.assert_array_equal(got, want, err_msg=f"{n} shards")


@pytest.mark.parametrize("n", [1, 3, 8])
def test_sgm_sharded_pallas_bit_equal(n):
    """The fused-Pallas sharded route (TPU path, interpreted here) must be
    bit-equal to the full-frame op for any shard count, including shard
    heights that are not multiples of the kernel row blocks (h=48 over 3
    shards = 16 rows; over 8 = 6 rows < the vertical reach)."""
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    h, w = 48, 128
    gl, gr = _stereo_pair(h, w)

    want = np.asarray(
        jax.jit(
            functools.partial(stereo.sgm_disparity, backend="xla", **KW)
        )(gl, gr)
    )

    mesh = Mesh(np.array(devs[:n]), (AX,))
    shard = NamedSharding(mesh, P(AX))
    local = functools.partial(
        sgm_disparity_sharded, axis_name=AX, backend="pallas_interpret", **KW
    )
    # check_vma=False HERE ONLY (same caveat as test_relax_sharded):
    # interpret mode discharges the kernels into dynamic_slice chains the
    # vma checker rejects when scratch (unvarying) mixes with varying
    # inputs; the compiled TPU path keeps check_vma=True — pallas_call is
    # opaque there and the out_shape vma declarations carry the types.
    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P(AX), P(AX)), out_specs=P(AX),
            check_vma=False,
        )
    )
    got = np.asarray(fn(jax.device_put(gl, shard), jax.device_put(gr, shard)))
    np.testing.assert_array_equal(got, want, err_msg=f"{n} shards (pallas)")

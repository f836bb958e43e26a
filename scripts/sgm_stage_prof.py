"""Microbenchmark of the SGM paths at flagship geometry.

Times census, the (test-only) split aggregation path, and the production
fused path in isolation with fetch-forced sync on the real chip.

Usage: python scripts/sgm_stage_prof.py [--disp 256] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Fetch one element: under the axon tunnel block_until_ready returns
    early, so a tiny device->host read is the only reliable sync."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _force(out)
    _force(fn(*args))  # absorb one fetch round-trip into the pipeline
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    rt = time.perf_counter() - t0
    # Subtract the single fetch round-trip measured on an empty queue.
    t1 = time.perf_counter()
    _force(out)
    fetch = time.perf_counter() - t1
    return (rt - fetch) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disp", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from cartslam_tpu.ops import stereo
    from cartslam_tpu.ops.pallas.sgm import sgm_aggregate_pallas

    h, w, d = 376, 1248, args.disp
    min_d, p1, p2, uniq = 4, 10, 120, 12
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randint(0, 255, (h, w), dtype=np.uint8))
    right = jnp.asarray(rng.randint(0, 255, (h, w), dtype=np.uint8))

    census = jax.jit(lambda a, b: (stereo.census_transform(a),
                                   stereo.census_transform(b)))
    cl, cr = census(left, right)
    jax.block_until_ready(cl)
    t_census = timeit(census, left, right, iters=args.iters)
    print(f"census x2:                    {t_census:7.3f} ms")

    agg = jax.jit(lambda cl, cr: sgm_aggregate_pallas(
        cl, cr, min_disparity=min_d, num_disparities=d, p1=p1, p2=p2))
    agg(cl, cr)
    t_agg = timeit(agg, cl, cr, iters=args.iters)
    print(f"split aggregate (test path):  {t_agg:7.3f} ms")

    full = jax.jit(lambda a, b: stereo.sgm_disparity(
        a, b, min_disparity=min_d, num_disparities=d, p1=p1, p2=p2,
        uniqueness=uniq, backend="pallas"))
    t_full = timeit(full, left, right, iters=args.iters)
    print(f"full fused sgm_disparity:     {t_full:7.3f} ms")


if __name__ == "__main__":
    main()

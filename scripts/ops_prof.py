"""Microbenchmark of non-SGM hot ops at flagship geometry (376x1248).

Times each op in isolation on the real chip (fetch-forced sync, amortized
over iters) to attribute the non-SGM half of the frame budget.

Usage: python scripts/ops_prof.py [--iters 20]
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
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _force(out)
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    rt = time.perf_counter() - t0
    t1 = time.perf_counter()
    _force(out)
    fetch = time.perf_counter() - t1
    print(f"{name:42s} {(rt - fetch) / iters * 1000:7.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    it = args.iters

    from cartslam_tpu.ops import optflow, planeseg, superpixels

    h, w = 376, 1248
    L = 3328
    rng = np.random.RandomState(0)
    cur = jnp.asarray(rng.randint(0, 255, (h, w), dtype=np.uint8))
    prev = jnp.asarray(rng.randint(0, 255, (h, w), dtype=np.uint8))
    labels = jnp.asarray(rng.randint(0, L, (h, w), dtype=np.int32))
    planes = jnp.asarray(rng.randint(0, 3, (h, w), dtype=np.uint8))
    flow = jnp.asarray(rng.randint(-640, 640, (h, w, 2), dtype=np.int16))
    warp_state = jnp.asarray(rng.randint(0, 4, (3, h, w), dtype=np.uint8))
    data = jnp.asarray(rng.randint(0, 255, (7, h, w)).astype(np.float32))
    stats = jnp.asarray(rng.rand(15, L).astype(np.float32))

    timeit("dense_flow (default half-res)", jax.jit(
        lambda a, b: optflow.dense_flow(a, b)), cur, prev, iters=it)

    timeit("temporal_vote_warped", jax.jit(
        lambda c, p, ws, f: planeseg.temporal_vote_warped(
            c, p, ws, f, 2, True)), planes, planes, warp_state, flow, iters=it)

    timeit("superpixel_vote (tally+paint)", jax.jit(
        lambda p, l: planeseg.superpixel_vote(p, l, L)), planes, labels,
        iters=it)

    timeit("init_stats (moment tally)", jax.jit(
        lambda l, d: superpixels.init_stats(l, d, L)), labels, data, iters=it)

    timeit("stat table gather (take axis=1)", jax.jit(
        lambda s, l: jnp.take(s, l, axis=1)), stats, labels, iters=it)

    timeit("paint gather (take [2,L] by labels)", jax.jit(
        lambda t, l: jnp.take(t, l, axis=1)[0]),
        jnp.zeros((2, L), jnp.int32), labels, iters=it)

    # Derivative + histograms
    from cartslam_tpu.ops import derivative as deriv
    disp = jnp.asarray(rng.randint(0, 4096, (h, w), dtype=np.int16))
    timeit("directional_derivatives+hist", jax.jit(
        deriv.directional_derivatives), disp, iters=it)

    from cartslam_tpu.ops import disparity as disp_ops
    timeit("interpolate (r=2, 1 iter)", jax.jit(
        lambda d: disp_ops.interpolate(
            d, radius=2, iterations=1, min_disparity=4,
            max_disparity=260)), disp, iters=it)


if __name__ == "__main__":
    main()

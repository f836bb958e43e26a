"""Measure true per-step DEVICE time of pipeline variants via profiler trace.

Over the dev tunnel, host-side wall times carry a ~34 ms fetch round-trip,
so this parses the jax.profiler device lane instead — the number a
production (PCIe-attached) host would see.

Usage: python scripts/device_time.py [--ablate]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def device_ms_per_step(pipeline, steps=3, fetch_key="planes", top=0):
    """Compile + run `steps` steps under a trace; return device ms/step."""
    import jax

    h, w = pipeline.ctx.height, pipeline.ctx.width
    rng = np.random.RandomState(0)
    frames = [
        {
            "left": jax.device_put(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)),
            "right": jax.device_put(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)),
            "frame_id": jax.device_put(np.int32(i + 2)),
        }
        for i in range(steps + 1)
    ]
    step = pipeline.jitted_step(pipeline.variant(2), frozenset({fetch_key}))
    state = jax.device_put(pipeline.init_state())
    params = pipeline.init_host_params()
    state, out = step(state, frames[0], params)
    np.asarray(out[fetch_key].reshape(-1)[:2])

    tdir = tempfile.mkdtemp(prefix="cart_trace_")
    try:
        with jax.profiler.trace(tdir):
            for i in range(steps):
                state, out = step(state, frames[1 + i], params)
            np.asarray(out[fetch_key].reshape(-1)[:2])
        path = glob.glob(os.path.join(tdir, "plugins/profile/*/*.trace.json.gz"))[0]
        with gzip.open(path) as f:
            data = json.load(f)
        ev = data.get("traceEvents", [])
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        dev = {p for p, n in pids.items() if "TPU" in n}
        total = 0.0
        by_op = collections.Counter()
        for e in ev:
            if e.get("ph") == "X" and e.get("pid") in dev:
                if e["name"].startswith("jit_"):
                    total += e.get("dur", 0)
                else:
                    by_op[e["name"]] += e.get("dur", 0)
        if top:
            for name, d in by_op.most_common(top):
                print(f"    {d / 1000 / steps:8.2f} ms  {name[:80]}")
        return total / 1000 / steps
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--disp", type=int, default=128)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_pipeline

    h, w = 376, 1248

    base = device_ms_per_step(
        _flagship_pipeline(h, w, num_disparities=args.disp), top=args.top
    )
    print(f"flagship ({args.disp} disp):          {base:7.2f} ms/step device")

    if args.ablate:
        from cartslam_tpu import models
        from cartslam_tpu.runtime.module import PipelineContext
        from cartslam_tpu.runtime.pipeline import Pipeline

        def variant(name, **kw):
            p = _flagship_pipeline(h, w, num_disparities=args.disp, **kw)
            ms = device_ms_per_step(p)
            print(f"{name:36s} {ms:7.2f} ms/step  (delta {ms - base:+7.2f})")

        variant("no temporal (no flow/vote)", temporal=False)
        variant("stats_refresh=phase", stats_refresh="phase")

        # Single-module pipelines for absolute floors.
        ctx = PipelineContext(height=h, width=w, q=np.eye(4, dtype=np.float32))
        disp_only = Pipeline(
            ctx,
            [
                models.ImageDisparityModule(
                    (h, w), min_disparity=4, num_disparities=args.disp,
                    smoothing_radius=2, smoothing_iterations=1,
                )
            ],
        )
        ms = device_ms_per_step(disp_only, fetch_key="disparity")
        print(f"{'disparity module alone':36s} {ms:7.2f} ms/step")


if __name__ == "__main__":
    main()

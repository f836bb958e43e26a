"""Per-module timing breakdown of the flagship pipeline on real hardware.

Runs the kitti-planeseg preset at KITTI geometry (376x1248) on textured
synthetic stereo frames, module-by-module with a device sync per module
(Pipeline.run_step_instrumented), and prints a mean/p50 table — the TPU
reproduction of the reference's per-module CSV protocol
(src/cartslam.cpp:259-291, include/timing.hpp:50-70).

Usage:  python scripts/profile_flagship.py [--frames N] [--disp D]
                                           [--fused] [--csv DIR]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1248)
    ap.add_argument("--disp", type=int, default=128)
    ap.add_argument("--fused", action="store_true",
                    help="also time the fused jitted step for comparison")
    ap.add_argument("--csv", default=None, help="write timing CSV into DIR")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--stats-refresh", default="phase", choices=("phase", "frame"))
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _flagship_pipeline
    from cartslam_tpu.sources.synthetic import SyntheticDataSource
    from cartslam_tpu.runtime.timing import TimingWriter

    h, w = args.height, args.width
    pipeline = _flagship_pipeline(
        h, w, num_disparities=args.disp, temporal=True,
        stats_refresh=args.stats_refresh,
    )
    src = SyntheticDataSource(
        image_size=(h, w), num_frames=args.frames + 2, max_disparity=args.disp * 0.6
    )

    state = jax.device_put(pipeline.init_state())
    params = pipeline.init_host_params()
    writer = TimingWriter(directory=args.csv) if args.csv else None

    frames = []
    for i in range(args.frames + 2):
        f = src.get_next()
        frames.append(
            {
                "left": jax.device_put(f["left"]),
                "right": jax.device_put(f["right"]),
                "frame_id": jax.device_put(np.int32(i + 1)),
            }
        )

    per_module = collections.defaultdict(list)
    frame_ms = []

    def run_one(i, record):
        nonlocal state
        variant = pipeline.variant(i + 1)
        t0 = time.perf_counter()
        state, outputs, times = pipeline.run_step_instrumented(
            state, frames[i], params, variant, frozenset({"planes"})
        )
        np.asarray(outputs["planes"][::97, ::97]).sum()  # force fetch
        t1 = time.perf_counter()
        if record:
            frame_ms.append((t1 - t0) * 1000)
            for name, t_init, t_start, t_end in times:
                per_module[name].append((t_end - t_start) * 1000)
                if writer:
                    hd = writer.init_timing(name, i + 1)
                    base = time.time() * 1000 - time.perf_counter() * 1000
                    hd.init = base + t_init * 1000
                    hd.start = base + t_start * 1000
                    hd.end = base + t_end * 1000
                    writer.end_timing_at(hd)

    print(f"compiling + warmup ({h}x{w}, {args.disp} disp)...", flush=True)
    run_one(0, False)  # frame 1: initial variant compile
    run_one(1, False)  # steady-state variant compile
    print("profiling...", flush=True)

    if args.trace:
        ctx = jax.profiler.trace(args.trace)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        for i in range(2, args.frames + 2):
            run_one(i, True)

    print(f"\n== per-module time (ms), {args.frames} frames ==")
    print("   NOTE: each row carries the host<->device sync round trip")
    print("   (~27 ms over the dev tunnel; microseconds on a PCIe host).")
    print("   Device-true attribution: scripts/device_time.py --top N.")
    total = 0.0
    for name, vals in sorted(per_module.items(), key=lambda kv: -np.mean(kv[1])):
        m = float(np.mean(vals))
        total += m
        print(f"  {name:28s} mean {m:8.2f}  p50 {np.percentile(vals, 50):8.2f}")
    print(f"  {'TOTAL (sum of modules)':28s} mean {total:8.2f}")
    print(f"  {'frame wall (instrumented)':28s} mean {np.mean(frame_ms):8.2f}")

    if args.fused:
        fetch = frozenset({"planes"})
        step = pipeline.jitted_step(pipeline.variant(4), fetch)
        print("compiling fused step...", flush=True)
        state2 = jax.device_put(pipeline.init_state())
        state2, out = step(state2, frames[2], params)
        np.asarray(out["planes"][::97, ::97]).sum()
        t0 = time.perf_counter()
        n = args.frames
        outs = []
        for i in range(n):
            state2, out = step(state2, frames[2 + (i % args.frames)], params)
            outs.append(out)
            if len(outs) > 3:
                np.asarray(outs.pop(0)["planes"][::97, ::97]).sum()
        for o in outs:
            np.asarray(o["planes"][::97, ::97]).sum()
        t1 = time.perf_counter()
        print(f"fused step: {(t1 - t0) / n * 1000:.2f} ms/frame "
              f"({n / (t1 - t0):.2f} fps)")


if __name__ == "__main__":
    main()

"""Benchmark: flagship plane-segmentation pipeline throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the kitti-planeseg preset (disparity SGM + smoothing, derivative,
depth, superpixels, optical flow, temporal superpixel plane segmentation) on
synthetic KITTI-geometry stereo (376 x 1248, 128 disparities).  Baseline =
the repo north star of 60 fps end-to-end per chip (BASELINE.json; the
reference publishes no numbers).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _flagship_pipeline

    h, w = 376, 1248
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    pipeline = _flagship_pipeline(h, w, num_disparities=128, temporal=True)

    fetch = frozenset({"planes"})
    step = pipeline.jitted_step(pipeline.variant(2), fetch)
    step_initial = pipeline.jitted_step(pipeline.variant(1), fetch)

    rng = np.random.RandomState(0)

    # Pre-upload a rotating set of frames: this measures per-chip COMPUTE
    # throughput.  (The dev harness reaches the TPU through a ~9 MB/s
    # tunnel, so per-frame host uploads would measure the tunnel, not the
    # chip; a production host feeds frames over PCIe at GB/s.)
    def make_frame(fid):
        return {
            "left": jax.device_put(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            ),
            "right": jax.device_put(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            ),
            "frame_id": jax.device_put(np.int32(fid)),
        }

    frame_list = [make_frame(i + 3) for i in range(8)]

    state = jax.device_put(pipeline.init_state())
    params = pipeline.init_host_params()

    def checksum(out):
        # Tiny fetch forces real execution (block_until_ready is unreliable
        # over the tunnel).
        return np.asarray(out["planes"][::97, ::97]).sum()

    # Warmup / compile both variants.
    state, out = step_initial(state, make_frame(1), params)
    checksum(out)
    state, out = step(state, frame_list[0], params)
    checksum(out)

    lat = []
    t0 = time.perf_counter()
    pending = []
    for i in range(frames):
        f = frame_list[i % len(frame_list)]
        t_start = time.perf_counter()
        state, out = step(state, f, params)
        pending.append((t_start, out))
        if len(pending) > 3:
            ts, o = pending.pop(0)
            checksum(o)
            lat.append(time.perf_counter() - ts)
    for ts, o in pending:
        checksum(o)
        lat.append(time.perf_counter() - ts)
    t1 = time.perf_counter()

    fps = frames / (t1 - t0)
    p50_ms = float(np.percentile(np.array(lat) * 1000, 50))

    print(
        json.dumps(
            {
                "metric": "kitti_planeseg_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec (376x1248, 128 disp, p50_latency_ms="
                + str(round(p50_ms, 1))
                + ")",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

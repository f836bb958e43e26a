"""Benchmark: flagship plane-segmentation pipeline throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the kitti-planeseg preset (disparity SGM 256 + smoothing,
derivative, depth, superpixels 24/8 iters, optical flow, temporal
superpixel plane segmentation) at KITTI geometry (376 x 1248) on textured
synthetic stereo (the synthetic source's multi-octave scene — uniform
noise would understate SGM/flow ambiguity).  256 disparities is the
reference module default (/root/reference/include/modules/disparity.hpp:27).
Baseline = the repo north star of 60 fps end-to-end per chip
(BASELINE.json; the reference publishes no numbers).

Measurement notes:
  * Frames are pre-uploaded: this measures per-chip COMPUTE throughput.
    (The dev harness reaches the TPU through a high-latency tunnel, so
    per-frame host uploads would measure the tunnel, not the chip; a
    production host feeds frames over PCIe.)
  * A drainer thread forces every frame's result with a small fetch; the
    main loop keeps a bounded in-flight queue (the System's own pattern).
    Without the thread, each fetch's ~34 ms tunnel round-trip would
    serialize the loop.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time

import numpy as np


def jnp_stack(xs):
    import jax.numpy as jnp

    return jnp.stack(xs, axis=0)

NUM_DISPARITIES = 256
H, W = 376, 1248
MAX_IN_FLIGHT = 8

_DONE = threading.Event()


def _emit_failure(reason: str):
    """Parseable artifact line for a failed run.  The r04 round lost its
    bench number entirely (rc 124, no JSON) because backend-init attempts
    against a downed tunnel each hung ~26 min; a zero-valued line that
    names the cause is strictly better than a driver timeout."""
    if _DONE.is_set():
        return
    _DONE.set()
    print(
        json.dumps(
            {
                "metric": "kitti_planeseg_fps_per_chip",
                "value": 0.0,
                "unit": f"frames/sec (FAILED: {reason})",
                "vs_baseline": 0.0,
            }
        ),
        flush=True,
    )


def _probe_backend():
    """Bounded, subprocess-isolated TPU backend probe.

    `jax.devices()` HANGS (not errors) during an axon tunnel outage, and
    an in-process init attempt that does error takes ~26 minutes — either
    way an unbounded attempt eats the driver's whole budget.  Probing in
    a child process with a hard timeout keeps this process jax-free until
    the backend is known reachable."""
    import subprocess

    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    per_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", "120"))
    delay_s = 30.0
    last = ""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                capture_output=True,
                text=True,
                timeout=per_s,
            )
            if r.returncode == 0:
                return
            tail = (r.stderr or "").strip().splitlines()
            last = tail[-1] if tail else f"probe rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = f"probe hung >{per_s:.0f}s (tunnel down)"
        print(
            f"bench: backend probe failed ({last}); attempt {i + 1}/{attempts}",
            file=sys.stderr,
            flush=True,
        )
        if i < attempts - 1:
            time.sleep(delay_s)
    _emit_failure(f"TPU backend unavailable after {attempts} probes: {last}")
    sys.exit(0)


def _arm_deadline():
    """Last-resort watchdog: if the JSON line hasn't been printed within
    BENCH_DEADLINE seconds (default 20 min — a warm run takes ~3), emit
    the failure line and exit before the driver's own timeout produces an
    artifact with no output at all."""
    deadline = float(os.environ.get("BENCH_DEADLINE", "1200"))

    def _killer():
        if not _DONE.wait(timeout=deadline):
            _emit_failure(f"bench exceeded {deadline:.0f}s deadline (stall)")
            os._exit(0)

    threading.Thread(target=_killer, daemon=True).start()


def main():
    _probe_backend()
    _arm_deadline()

    import jax

    from __graft_entry__ import _enable_compile_cache, _flagship_pipeline
    from cartslam_tpu.sources.synthetic import SyntheticDataSource

    _enable_compile_cache()

    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    pipeline = _flagship_pipeline(H, W, num_disparities=NUM_DISPARITIES, temporal=True)

    fetch = frozenset({"planes"})
    step = pipeline.jitted_step(pipeline.variant(2), fetch)
    step_initial = pipeline.jitted_step(pipeline.variant(1), fetch)

    # Chunked dispatch: CHUNK steps per jitted call — the dev tunnel costs
    # ~3 ms per dispatch round-trip, which at 17 ms/frame device time is
    # ~18% overhead; chunking amortizes it (frames still run strictly
    # sequentially through the carried state).
    CHUNK = int(os.environ.get("BENCH_CHUNK", "8"))
    raw_step = pipeline.make_step(pipeline.variant(2), fetch)

    @jax.jit
    def step_chunk(state, frames, params):
        outs = None
        for i in range(CHUNK):
            frame_i = jax.tree.map(lambda x: x[i], frames)
            state, outs = raw_step(state, frame_i, params)
        return state, outs  # last frame's outputs

    src = SyntheticDataSource(
        image_size=(H, W), num_frames=10, max_disparity=160.0, baseline=40.0
    )
    frame_list = []
    for i in range(max(8, CHUNK)):
        f = src.get_next()
        frame_list.append(
            {
                "left": jax.device_put(f["left"]),
                "right": jax.device_put(f["right"]),
                "frame_id": jax.device_put(np.int32(i + 3)),
            }
        )

    state = jax.device_put(pipeline.init_state())
    params = pipeline.init_host_params()

    def checksum(out):
        # Tiny fetch forces real execution (block_until_ready is unreliable
        # over the tunnel).
        return np.asarray(out["planes"][::97, ::97]).sum()

    # Warmup / compile both variants.
    state, out = step_initial(state, frame_list[0] | {"frame_id": np.int32(1)}, params)
    checksum(out)
    state, out = step(state, frame_list[0], params)
    checksum(out)

    # Drainer thread: forces completion with a small fetch on every PROBE-th
    # frame (plus the last), recording dispatch->done latency for those.
    # Every frame still executes — the carried state chains each step to
    # the previous one — but per-frame fetches would serialize the loop on
    # the dev tunnel's ~34 ms round trip, which a PCIe-attached production
    # host does not have.
    PROBE = 32
    q: queue.Queue = queue.Queue(maxsize=MAX_IN_FLIGHT)
    done_t = []

    def drainer():
        while True:
            item = q.get()
            if item is None:
                return
            t_start, out = item
            checksum(out)
            done_t.append((t_start, time.perf_counter()))

    th = threading.Thread(target=drainer, daemon=True)
    th.start()

    # Stack frames into CHUNK-sized dispatch groups.
    chunks = []
    for c in range(len(frame_list) // CHUNK):
        group = frame_list[c * CHUNK : (c + 1) * CHUNK]
        chunks.append(
            jax.tree.map(lambda *xs: jnp_stack(xs), *group)
        )
    # Warm the chunked compile.
    state, out = step_chunk(state, chunks[0], params)
    checksum(out)

    n_chunks = max(frames_n // CHUNK, 1)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        f = chunks[i % len(chunks)]
        t_start = time.perf_counter()
        state, out = step_chunk(state, f, params)
        if i % (PROBE // CHUNK) == 0 or i == n_chunks - 1:
            q.put((t_start, out))  # bounded in-flight probe results
    q.put(None)
    th.join()
    t1 = time.perf_counter()

    fps = n_chunks * CHUNK / (t1 - t0)

    # Single-frame latency, measured serially (dispatch -> full result
    # fetch, includes one dev-tunnel round trip).
    lat = []
    for i in range(6):
        f = frame_list[i % len(frame_list)]
        ts = time.perf_counter()
        state, out = step(state, f, params)
        checksum(out)
        lat.append(time.perf_counter() - ts)
    p50_ms = float(np.percentile(np.array(lat) * 1000, 50))

    _DONE.set()  # disarm the deadline watchdog before printing
    print(
        json.dumps(
            {
                "metric": "kitti_planeseg_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec (376x1248, 256 disp, p50_latency_ms="
                + str(round(p50_ms, 1))
                + ")",
                "vs_baseline": round(fps / 60.0, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Measure the reference's benchmark protocol on TPU and emit the
BASELINE.md actuals: per-preset device ms/step + the superpixel
iteration/block-size sweeps (reference harness:
config/modules/superpixels/config_gen.py).

Writes JSON lines to stdout; run on the real chip:
    python scripts/run_baseline_measurements.py > /tmp/baseline_actuals.jsonl
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

H, W, DISP = 376, 1248, 256


def build_preset(name):
    import json as _json

    from cartslam_tpu.config.registry import _build_module, ConfigState
    from cartslam_tpu.runtime.module import HostModule, PipelineContext
    from cartslam_tpu.runtime.pipeline import Pipeline

    with open(os.path.join("configs", "modules", f"{name}.json")) as f:
        cfgs = _json.load(f)
    st = ConfigState((H, W))
    mods = []
    for cfg in cfgs:
        if cfg["type"] == "disparity":
            cfg = {**cfg, "num_disparities": DISP}
        m = _build_module(cfg, st)
        if m is not None and not isinstance(m, HostModule):
            mods.append(m)
    q = np.eye(4, dtype=np.float32)
    q[2, 2], q[2, 3], q[3, 2], q[3, 3] = 0.0, 718.0, 1.0 / 0.5, 0.0
    ctx = PipelineContext(height=H, width=W, q=q)
    return Pipeline(ctx, mods)


def superpixel_pipeline(iterations=8, block_size=12):
    from __graft_entry__ import _flagship_pipeline
    from cartslam_tpu import models
    from cartslam_tpu.runtime.module import PipelineContext
    from cartslam_tpu.runtime.pipeline import Pipeline

    q = np.eye(4, dtype=np.float32)
    ctx = PipelineContext(height=H, width=W, q=q)
    return Pipeline(
        ctx,
        [
            models.ImageDisparityModule(
                (H, W), num_disparities=DISP,
                smoothing_radius=3, smoothing_iterations=3,
            ),
            models.ImageDisparityDerivativeModule(),
            models.SuperPixelModule(
                (H, W), initial_iterations=iterations, iterations=iterations,
                block_size=block_size,
            ),
        ],
    )


def main():
    from scripts.device_time import device_ms_per_step

    presets = {
        "kitti-disparity": "disparity",
        "kitti-naive-segmentation": "planes",
        "kitti-superpixels": "superpixels",
        "kitti-planeseg": "planes",
    }
    for name, fetch in presets.items():
        try:
            ms = device_ms_per_step(build_preset(name), fetch_key=fetch)
            print(json.dumps({"preset": name, "device_ms_per_step": round(ms, 2),
                              "fps": round(1000 / ms, 1)}), flush=True)
        except Exception as e:  # keep sweeping
            print(json.dumps({"preset": name, "error": str(e)[:200]}), flush=True)

    for iters in (2, 4, 6, 8, 16, 32):
        ms = device_ms_per_step(
            superpixel_pipeline(iterations=iters), fetch_key="superpixels"
        )
        print(json.dumps({"sweep": "iterations", "value": iters,
                          "device_ms_per_step": round(ms, 2)}), flush=True)

    for bs in (8, 12, 16, 24, 32, 40):
        ms = device_ms_per_step(
            superpixel_pipeline(block_size=bs), fetch_key="superpixels"
        )
        print(json.dumps({"sweep": "block_size", "value": bs,
                          "device_ms_per_step": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()

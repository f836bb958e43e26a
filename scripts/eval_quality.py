"""Quality-parity evaluation on the synthetic ground-truth source.

Runs the flagship pipeline on the synthetic scene and reports:
  * superpixel boundary recall + under-segmentation error (SURVEY §7 hard
    part 2 — metric parity, not bit parity),
  * optical-flow endpoint error vs the known pan (hard part 5),
  * plane-label accuracy on region interiors.

Used to gate speed/quality trades (relax stats_refresh, phases, flow
search budget).  Usage: python scripts/eval_quality.py [--stats-refresh X]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def evaluate(
    stats_refresh="phase",
    frames=8,
    # Width >= 320: the reference's faithful interpolate quirk bounds
    # max disparity at width/16 (disparity.hpp:28-29), and the scene's
    # ground ramp reaches disparity 16.
    image_size=(96, 320),
    num_disparities=32,
    flow_kwargs=None,
):
    import jax

    from __graft_entry__ import _flagship_pipeline
    from cartslam_tpu.sources.synthetic import SyntheticDataSource
    from cartslam_tpu.utils import quality
    from cartslam_tpu.ops import planeseg as pops

    h, w = image_size
    # baseline=2.0 puts the wall slab at disparity ~6.7-10 (above the
    # flagship min_disparity of 4); the ground ramps 0..16.
    src = SyntheticDataSource(
        image_size=(h, w), num_frames=frames, max_disparity=20, baseline=2.0
    )
    pipeline = _flagship_pipeline(
        h, w, num_disparities=num_disparities, temporal=True,
        stats_refresh=stats_refresh,
    )
    fetch = frozenset({"planes", "superpixels", "optflow"})
    state = jax.device_put(pipeline.init_state())
    params = pipeline.init_host_params()

    out = None
    for i in range(frames):
        f = src.get_next()
        frame = {
            "left": f["left"],
            "right": f["right"],
            "frame_id": np.int32(i + 1),
        }
        step = pipeline.jitted_step(pipeline.variant(i + 1), fetch)
        state, out = step(state, frame, params)

    last = frames - 1
    sp = np.asarray(out["superpixels"])
    planes = np.asarray(out["planes"])
    flow = np.asarray(out["optflow"]).astype(np.float32) / 32.0  # S10.5 -> px

    gt_regions = src.ground_truth_regions(last)
    gt_flow = src.ground_truth_flow(last)

    # Flow is only meaningful where the previous frame saw the same content;
    # exclude a border strip equal to the pan + search slack.
    mask = np.zeros((h, w), bool)
    mask[8:-8, 12:-12] = True

    return {
        "stats_refresh": stats_refresh,
        "boundary_recall": round(quality.boundary_recall(gt_regions, sp), 4),
        "underseg_error": round(
            quality.undersegmentation_error(gt_regions, sp), 4
        ),
        "flow_epe_px": round(quality.flow_epe(flow, gt_flow, mask), 4),
        "plane_accuracy": round(
            quality.plane_accuracy(
                planes,
                # Pixels below the SGM search range (d < minD+1) are invalid
                # by design -> excluded (mark as a region with no mapping).
                np.where(
                    src.ground_truth_disparity(last) >= 5.0, gt_regions, 255
                ),
                {
                    src.GT_GROUND: pops.HORIZONTAL,
                    src.GT_WALL: pops.VERTICAL,
                },
            ),
            4,
        ),
        "num_superpixels": int(len(np.unique(sp))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stats-refresh", default=None)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    modes = [args.stats_refresh] if args.stats_refresh else ["phase", "frame"]
    for mode in modes:
        print(json.dumps(evaluate(stats_refresh=mode, frames=args.frames)))


if __name__ == "__main__":
    main()

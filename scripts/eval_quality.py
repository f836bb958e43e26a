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


def natural_texture(h: int, w: int) -> "np.ndarray":
    """Grayscale float32 texture from a real photograph (matplotlib's
    grace_hopper sample) — natural image statistics instead of the
    procedural multi-octave noise, tiled horizontally if needed."""
    import cv2
    import matplotlib

    path = matplotlib.cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE).astype(np.float32)
    reps = int(np.ceil(w / img.shape[1] * 1.0)) + 1
    # Mirror-tile so seams don't introduce a hard synthetic edge.
    tiles = [img if i % 2 == 0 else img[:, ::-1] for i in range(reps)]
    wide = np.concatenate(tiles, axis=1)
    return cv2.resize(wide, (w, h), interpolation=cv2.INTER_AREA)


def evaluate(
    stats_refresh="phase",
    frames=8,
    # Width >= 320: the reference's faithful interpolate quirk bounds
    # max disparity at width/16 (disparity.hpp:28-29), and the scene's
    # ground ramp reaches disparity 16.
    image_size=(96, 320),
    num_disparities=32,
    flow_kwargs=None,
    texture="procedural",
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
    if texture == "natural":
        # Same scene geometry and ground truth, REAL image statistics:
        # the full flagship (disparity -> derivative -> superpixels ->
        # flow -> planeseg) runs on a photograph-textured scene.
        src._tex = natural_texture(*src._tex.shape)
    pipeline = _flagship_pipeline(
        h, w, num_disparities=num_disparities, temporal=True,
        stats_refresh=stats_refresh,
    )
    fetch = frozenset({"planes", "superpixels", "optflow", "disparity"})
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

    # Disparity accuracy vs the scene's exact field (int16 x16 contract).
    disp = np.asarray(out["disparity"]).astype(np.float32) / 16.0
    gt_disp = src.ground_truth_disparity(last)
    interior = np.zeros((h, w), bool)
    interior[4:-4, num_disparities + 8 : -8] = True
    searchable = interior & (gt_disp >= 5.0)  # below minD+1 = invalid by design
    valid = disp > 0
    disp_err = np.abs(disp - gt_disp)[searchable & valid]

    return {
        "stats_refresh": stats_refresh,
        "texture": texture,
        "disp_valid_frac": round(float(valid[searchable].mean()), 4),
        "disp_med_err_px": round(float(np.median(disp_err)), 4),
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
    ap.add_argument("--texture", default="procedural",
                    choices=["procedural", "natural"])
    args = ap.parse_args()

    modes = [args.stats_refresh] if args.stats_refresh else ["phase", "frame"]
    for mode in modes:
        print(json.dumps(evaluate(
            stats_refresh=mode, frames=args.frames, texture=args.texture
        )))


if __name__ == "__main__":
    main()

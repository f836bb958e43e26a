"""Generate the config corpus mirroring the reference's inventory.

Reference: /root/reference/config/ — 22 KITTI sequence sources + 10 ZED
sources and 13 module presets (SURVEY §2.6).  Ours carry the same type
strings and parameters (the JSON schema IS the user contract); ZED sources
point at the directory/npz stereo+disparity format of sources/zed.py since
the proprietary SVO/SDK does not exist on TPU hosts (SURVEY §7 step 7).

Run from the repo root:  python scripts/gen_parity_configs.py
"""

from __future__ import annotations

import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

KITTI_SEQUENCES = 22
ZED_RECORDINGS = [
    "docking-1", "docking-2", "docking-3", "docking-4", "docking-5",
    "harbor-1", "harbor-2", "harbor-3", "transit-1", "transit-2",
]

SP24_8 = {
    "type": "superpixels", "initial_iterations": 24, "iterations": 8,
    "block_size": 12, "reset_iterations": 64,
}
SP24_12 = {
    "type": "superpixels", "initial_iterations": 24, "iterations": 12,
    "block_size": 12, "reset_iterations": 64,
}
HIST = {"type": "histogram_peak"}
ZED_STATIC = {
    "type": "static",
    "horizontal_range_min": 1, "horizontal_range_max": 30,
    "vertical_range_min": -3, "vertical_range_max": 1,
}

MODULE_PRESETS = {
    "kitti-disparity": [
        {"type": "disparity", "smoothing_radius": 3, "smoothing_iterations": 1},
        {"type": "disparity_visualization"},
    ],
    "kitti-optflow": [
        {"type": "optflow"},
        {"type": "optflow_visualization"},
    ],
    "kitti-naive-segmentation": [
        {"type": "disparity", "smoothing_radius": 2, "smoothing_iterations": 1},
        {"type": "disparity_planeseg", "parameter_provider": HIST},
        {"type": "disparity_planeseg_visualization", "show_histogram": True},
    ],
    "kitti-naive-segmentation-temporal": [
        {"type": "optflow"},
        {"type": "disparity", "smoothing_radius": 2, "smoothing_iterations": 1},
        {"type": "disparity_planeseg", "parameter_provider": HIST,
         "use_temporal_smoothing": True},
        {"type": "disparity_planeseg_visualization", "show_histogram": True},
    ],
    "kitti-superpixels": [
        {"type": "disparity", "smoothing_radius": 3, "smoothing_iterations": 3},
        {"type": "disparity_derivative"},
        {"type": "superpixels", "initial_iterations": 24, "iterations": 8,
         "block_size": 10, "reset_iterations": 64, "disparity_weight": 1.0,
         "compactness_weight": 0.03, "progressive_compactness_cost": 1.0},
        {"type": "superpixels_visualization"},
    ],
    "kitti-planeseg": [
        SP24_8,
        {"type": "optflow"},
        {"type": "disparity", "smoothing_radius": 2, "smoothing_iterations": 1},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "superpixel_disparity_planeseg", "parameter_provider": HIST,
         "use_temporal_smoothing": True},
        {"type": "disparity_planeseg_visualization", "show_histogram": False},
        {"type": "bev_planeseg_visualization"},
    ],
    "kitti-planefit": [
        SP24_12,
        {"type": "optflow"},
        {"type": "disparity", "smoothing_radius": 3, "smoothing_iterations": 4},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "planefit"},
        {"type": "planefit_visualization"},
    ],
    "kitti-planecluster": [
        SP24_12,
        {"type": "optflow"},
        {"type": "disparity", "smoothing_radius": 3, "smoothing_iterations": 4},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "planecluster"},
        {"type": "planefit_visualization"},
    ],
    "zed-naive-segmentation": [
        {"type": "zed_disparity"},
        {"type": "disparity_planeseg", "parameter_provider": ZED_STATIC},
        {"type": "disparity_planeseg_visualization", "show_histogram": True},
    ],
    "zed-naive-segmentation-temporal": [
        {"type": "optflow"},
        {"type": "zed_disparity"},
        {"type": "disparity_planeseg", "parameter_provider": ZED_STATIC,
         "use_temporal_smoothing": True},
        {"type": "disparity_planeseg_visualization", "show_histogram": True},
    ],
    "zed-planeseg": [
        {"type": "superpixels", "initial_iterations": 24, "iterations": 8,
         "block_size": 16, "reset_iterations": 64},
        {"type": "optflow"},
        {"type": "zed_disparity"},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "superpixel_disparity_planeseg", "parameter_provider": ZED_STATIC,
         "use_temporal_smoothing": True},
        {"type": "disparity_planeseg_visualization", "show_histogram": False},
        {"type": "bev_planeseg_visualization"},
    ],
    "zed-planefit": [
        {"type": "zed_disparity"},
        SP24_12,
        {"type": "optflow"},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "planefit"},
        {"type": "planefit_visualization"},
    ],
    # The reference's zed-planecluster.json actually runs planefit (a copy
    # slip there); ours runs the clusterer the name promises.
    "zed-planecluster": [
        {"type": "zed_disparity"},
        SP24_12,
        {"type": "optflow"},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "planecluster"},
        {"type": "planefit_visualization"},
    ],
}


def write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")


def main():
    for seq in range(KITTI_SEQUENCES):
        write(
            os.path.join(ROOT, "sources", f"kitti-{seq}.json"),
            {"type": "kitti", "path": "~/Datasets/KITTI/dataset", "sequence": seq},
        )
    for name in ZED_RECORDINGS:
        write(
            os.path.join(ROOT, "sources", f"zed-{name}.json"),
            {
                "type": "zed",
                "path": f"~/Datasets/ZED/{name}.npz",
                "include_disparity": True,
            },
        )
    for name, modules in MODULE_PRESETS.items():
        write(os.path.join(ROOT, "modules", f"{name}.json"), modules)
    print(f"wrote {KITTI_SEQUENCES} kitti + {len(ZED_RECORDINGS)} zed sources, "
          f"{len(MODULE_PRESETS)} module presets")


if __name__ == "__main__":
    main()

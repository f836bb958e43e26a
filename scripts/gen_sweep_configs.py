"""Generate superpixel parameter-sweep module configs.

Equivalent of the reference's config/modules/superpixels/config_gen.py:
iteration sweep {2,4,6,8,16,32} at block_size 12, and block-size sweep
{8..40 step 4} at 8 iterations, each paired with the superpixel plane
segmentation stage so the benchmark measures the full chain.
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "configs", "modules", "superpixels")


def pipeline(iterations: int, block_size: int) -> list[dict]:
    return [
        {
            "type": "superpixels",
            "initial_iterations": max(iterations, 18),
            "iterations": iterations,
            "block_size": block_size,
            "reset_iterations": 64,
        },
        {"type": "disparity", "smoothing_radius": 2, "smoothing_iterations": 1},
        {"type": "disparity_derivative"},
        {
            "type": "superpixel_disparity_planeseg",
            "parameter_provider": {"type": "histogram_peak"},
        },
    ]


def main():
    os.makedirs(OUT, exist_ok=True)
    for it in (2, 4, 6, 8, 16, 32):
        path = os.path.join(OUT, f"iterations-{it}.json")
        with open(path, "w") as f:
            json.dump(pipeline(it, 12), f, indent=2)
    for bs in range(8, 41, 4):
        path = os.path.join(OUT, f"block-size-{bs}.json")
        with open(path, "w") as f:
            json.dump(pipeline(8, bs), f, indent=2)
    print(f"wrote sweep configs to {OUT}")


if __name__ == "__main__":
    main()

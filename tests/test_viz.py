"""Smoke tests: every host visualization module renders on real outputs.

The reference's de-facto test suite is its visualization windows (SURVEY
§4.3); here each renderer must at least produce a sane BGR image from a
real pipeline run's fetched outputs.
"""

import os
import numpy as np
import pytest

from cartslam_tpu.config import build_system
from cartslam_tpu.viz import host_modules as vm

SRC = {"type": "synthetic", "image_size": [64, 128], "num_frames": 3,
       "baseline": 2.0, "max_disparity": 20}


@pytest.fixture(scope="module")
def run_outputs():
    mods = [
        {"type": "disparity", "num_disparities": 32, "min_disparity": 0},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "optflow"},
        {"type": "superpixels", "block_size": 8, "initial_iterations": 2,
         "iterations": 1},
        {
            "type": "superpixel_disparity_planeseg",
            "parameter_provider": {"type": "histogram_peak"},
            "use_temporal_smoothing": True,
        },
        {"type": "features", "keypoints": 64},
        {"type": "planefit"},
    ]
    keys = [
        "disparity", "disparity_derivative", "depth", "optflow",
        "superpixels", "planes", "planes_unsmoothed", "features",
        "disparity_derivative_histogram",
    ]
    system = build_system(SRC, mods, extra_fetch_keys=keys)
    frames = {}
    sources = {}

    def on_frame(fid, out):
        frames[fid] = out

    system.run(on_frame=on_frame)
    # host module 'planefit' stored planes_eq in global data
    return system, frames[3]


def _frame_np():
    rng = np.random.RandomState(0)
    return {"left": rng.randint(0, 255, (64, 128, 3), dtype=np.uint8)}


@pytest.mark.parametrize(
    "mod",
    [
        vm.DisparityVisualization(),
        vm.DerivativeVisualization(),
        vm.DepthVisualization(),
        vm.OpticalFlowVisualization(points=5),
        vm.SuperPixelVisualization(),
        vm.PlaneSegmentationVisualization(show_histogram=True, show_unsmoothed=True),
        vm.BEVVisualization(),
        vm.FeatureVisualization(),
        vm.PlaneFitVisualization(),
    ],
    ids=lambda m: m.name,
)
def test_visualization_renders(run_outputs, mod):
    system, fetched = run_outputs
    frame = _frame_np()
    # Flow vis needs a previous frame; feed two frames.
    img = mod.render(system.pipeline.ctx, 2, frame, fetched, system.global_data)
    img = mod.render(system.pipeline.ctx, 3, frame, fetched, system.global_data)
    if img is None:
        pytest.skip(f"{mod.name} renders nothing for this input")
    imgs = img.values() if isinstance(img, dict) else [img]
    for im in imgs:
        assert im.dtype == np.uint8 and im.ndim == 3 and im.shape[-1] == 3
        assert im.shape[1] >= 128


def test_module_timing_rows(tmp_path):
    """--module-timing produces a CSV row per module per frame with the
    reference's column contract (init <= start <= end)."""
    from cartslam_tpu.runtime.timing import TimingWriter

    mods = [
        {"type": "disparity", "num_disparities": 16, "min_disparity": 0},
        {"type": "disparity_derivative"},
    ]
    tw = TimingWriter(directory=str(tmp_path), enabled=True)
    system = build_system(
        dict(SRC), mods, timing=tw, module_timing=True, max_frames=2
    )
    system.run()
    tw.close()
    csv = list(tmp_path.glob("timing-*.csv"))[0].read_text().strip().splitlines()
    assert csv[0] == "name;run_id;time_init;time_start;time_end;duration_ms"
    rows = [r.split(";") for r in csv[1:]]
    names = {r[0] for r in rows}
    assert {"ImageDisparity", "ImageDisparityDerivative", "frame", "system"} <= names
    for r in rows:
        assert float(r[2]) <= float(r[3]) <= float(r[4])


def test_ui_sinks(tmp_path):
    """Drop-late-frame store + PNG sampler + video recorder contracts
    (reference: ImageThread/ImageProvider, src/utils/ui.cpp:73-156)."""
    from cartslam_tpu.viz.ui import ImageStore, SampleSink, VideoSink

    store = ImageStore()
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 9, np.uint8)
    store.set_image_if_later("win", a, 5)
    store.set_image_if_later("win", b, 3)  # late frame: dropped
    fid, img = store.snapshot()["win"]
    assert fid == 5 and (img == a).all()

    s = SampleSink(directory=str(tmp_path / "samples"), interval=2)
    for i in (1, 2, 3, 4):
        s.set_image_if_later("plane seg", b, i)
    written = sorted(os.listdir(tmp_path / "samples"))
    assert written == ["plane_seg-000002.png", "plane_seg-000004.png"]

    v = VideoSink(directory=str(tmp_path / "rec"), fps=5)
    for i in (1, 2, 3):
        v.set_image_if_later("w", b, i)
    v.close()
    rec = os.listdir(tmp_path / "rec")
    assert len(rec) == 1 and rec[0].endswith((".avi", ".mp4"))

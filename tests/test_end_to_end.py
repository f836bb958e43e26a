"""End-to-end pipeline tests on the synthetic source (the fake backend)."""

import numpy as np
import pytest

from cartslam_tpu.config import build_system

SRC = {"type": "synthetic", "image_size": [64, 128], "num_frames": 6}


def run(mods, extra, max_in_flight=4, num_frames=6, src=None):
    s = dict(SRC)
    if src:
        s.update(src)
    s["num_frames"] = num_frames
    system = build_system(s, mods, extra_fetch_keys=extra)
    results = {}
    n = system.run(on_frame=lambda fid, out: results.update({fid: out}))
    assert n == num_frames
    return system, results


def test_naive_segmentation_pipeline():
    mods = [
        {"type": "disparity", "num_disparities": 48, "min_disparity": 0},
        {"type": "disparity_derivative"},
        {"type": "depth"},
        {"type": "disparity_planeseg", "parameter_provider": {"type": "histogram_peak"}},
    ]
    system, results = run(mods, ["planes", "disparity", "depth"])
    out = results[5]

    gt = system.source.ground_truth_disparity(4)
    d = out["disparity"].astype(np.float32) / 16.0
    valid = out["disparity"] != -32768
    assert valid.mean() > 0.8
    assert (np.abs(d - gt)[valid] <= 1).mean() > 0.9

    pl = out["planes"]
    # Ground (bottom rows) mostly HORIZONTAL.
    assert (pl[52:] == 0).mean() > 0.5
    assert "plane_parameters" in system.global_data


def test_temporal_smoothing_pipeline():
    mods = [
        {"type": "optflow"},
        {"type": "disparity", "num_disparities": 48, "min_disparity": 0},
        {
            "type": "disparity_planeseg",
            "parameter_provider": {"type": "static", "horizontal_range_min": 5,
                                    "horizontal_range_max": 60,
                                    "vertical_range_min": -5,
                                    "vertical_range_max": 5},
            "use_temporal_smoothing": True,
        },
    ]
    system, results = run(mods, ["planes", "planes_unsmoothed", "optflow"])
    out = results[5]
    assert out["planes"].shape == (64, 128)
    assert out["planes_unsmoothed"].shape == (64, 128)
    # Smoothing must not produce wildly different fractions than unsmoothed.
    f_s = (out["planes"] == 0).mean()
    f_u = (out["planes_unsmoothed"] == 0).mean()
    assert abs(f_s - f_u) < 0.4


def test_superpixel_planeseg_pipeline():
    mods = [
        {"type": "disparity", "num_disparities": 48, "min_disparity": 0},
        {"type": "disparity_derivative"},
        {"type": "superpixels", "block_size": 8, "initial_iterations": 4,
         "iterations": 2},
        {
            "type": "superpixel_disparity_planeseg",
            "parameter_provider": {"type": "histogram_peak"},
        },
    ]
    system, results = run(mods, ["planes", "superpixels"], num_frames=4)
    out = results[4]
    labels = out["superpixels"]
    assert labels.min() >= 0
    n_labels = len(np.unique(labels))
    assert n_labels > 20  # superpixels survived relaxation
    # planes constant within each superpixel
    pl = out["planes"]
    flat = labels.reshape(-1)
    first = np.full(labels.max() + 1, 255, np.int32)
    np.minimum.at(first, flat, pl.reshape(-1))
    mx = np.zeros(labels.max() + 1, np.int32)
    np.maximum.at(mx, flat, pl.reshape(-1))
    used = np.zeros(labels.max() + 1, bool)
    used[flat] = True
    assert (first[used] == mx[used]).all()


def test_error_in_one_frame_does_not_kill_loop(monkeypatch):
    """Genuine fault injection at FETCH time (where async device errors
    surface): the frame is dropped, state recovers from the snapshot, and
    the loop continues to the end (src/main.cpp:48-54 semantics)."""
    mods = [
        {"type": "disparity", "num_disparities": 16, "min_disparity": 0},
        {"type": "optflow"},  # carried state exercises snapshot recovery
    ]
    system = build_system(dict(SRC), mods, extra_fetch_keys=["disparity"])

    orig = system._fetch_with_timeout
    calls = {"n": 0}

    def flaky(outputs):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected async device failure")
        return orig(outputs)

    monkeypatch.setattr(system, "_fetch_with_timeout", flaky)
    results = {}
    n = system.run(on_frame=lambda fid, out: results.update({fid: out}))
    assert system.failed_frames, "injected failure was not recorded"
    assert n >= 4, n  # all but the failed frame (and its poisoned chain)
    assert max(results) == 6  # the loop reached the end of the sequence


def test_fetch_watchdog_times_out(monkeypatch):
    """A hung result fetch raises DataNotAvailableException after
    data_timeout (the reference's 20 s guard, src/utils/data.cpp:42-49) and
    the loop still completes."""
    import time as _time

    from cartslam_tpu.runtime.system import DataNotAvailableException

    mods = [{"type": "disparity", "num_disparities": 16, "min_disparity": 0}]
    system = build_system(
        dict(SRC), mods, extra_fetch_keys=["disparity"], data_timeout=2.0
    )
    calls = {"n": 0}

    class Hang:
        def items(self):
            _time.sleep(8.0)
            return []

    orig_fetch = system._fetch_with_timeout

    def maybe_hang(outputs):
        calls["n"] += 1
        if calls["n"] == 2:
            return orig_fetch(Hang())
        return orig_fetch(outputs)

    monkeypatch.setattr(system, "_fetch_with_timeout", maybe_hang)
    n = system.run()
    assert system.failed_frames, "watchdog timeout not recorded"
    assert n >= 4


def test_grayscale_whole_pipeline():
    """CARTSLAM_IMAGE_MAKE_GRAYSCALE equivalent: every module runs on
    1-channel images end-to-end."""
    mods = [
        {"type": "disparity", "num_disparities": 48, "min_disparity": 0},
        {"type": "disparity_derivative"},
        {"type": "superpixels", "block_size": 8, "initial_iterations": 4,
         "iterations": 2},
        {
            "type": "superpixel_disparity_planeseg",
            "parameter_provider": {"type": "histogram_peak"},
        },
    ]
    system = build_system(
        dict(SRC), mods, grayscale=True, extra_fetch_keys=["planes", "disparity"]
    )
    results = {}
    n = system.run(on_frame=lambda fid, out: results.update({fid: out}))
    assert n == 6
    out = results[6]
    assert out["planes"].shape == (64, 128)
    assert (out["disparity"] != -32768).mean() > 0.5

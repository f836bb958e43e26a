"""Checkpoint/resume: a resumed run must reproduce the uninterrupted run."""

import os

import numpy as np

from cartslam_tpu.config import build_system

SRC = {"type": "synthetic", "image_size": [48, 96], "num_frames": 8}
MODS = [
    {"type": "optflow"},
    {"type": "disparity", "num_disparities": 32, "min_disparity": 0},
    {
        "type": "disparity_planeseg",
        "parameter_provider": {
            "type": "static",
            "horizontal_range_min": 5,
            "horizontal_range_max": 60,
            "vertical_range_min": -5,
            "vertical_range_max": 5,
        },
        "use_temporal_smoothing": True,
    },
]


def collect(system):
    results = {}
    system.run(on_frame=lambda fid, out: results.update({fid: out}))
    return results


def test_resume_reproduces_uninterrupted_run(tmp_path):
    ckpt = str(tmp_path / "state.npz")

    full = collect(build_system(SRC, MODS, extra_fetch_keys=["planes"]))

    # Run to frame 4, checkpointing every frame.
    sys_a = build_system(
        SRC, MODS, extra_fetch_keys=["planes"], max_frames=4,
        checkpoint_path=ckpt, checkpoint_interval=1,
    )
    collect(sys_a)
    assert os.path.exists(ckpt)

    # Resume and run the rest.
    sys_b = build_system(
        SRC, MODS, extra_fetch_keys=["planes"], resume_from=ckpt,
    )
    resumed = collect(sys_b)

    assert sorted(resumed.keys()) == [5, 6, 7, 8]
    for fid in (5, 6, 7, 8):
        np.testing.assert_array_equal(resumed[fid]["planes"], full[fid]["planes"])


def test_resume_with_histogram_provider(tmp_path):
    """ADVICE r1: resume must also reproduce runs whose provider state is
    host-side running histograms — System drains in-flight frames before
    each save so host state matches the saved device state."""
    ckpt = str(tmp_path / "hist.npz")
    mods = [
        {"type": "optflow"},
        {"type": "disparity", "num_disparities": 32, "min_disparity": 0},
        {
            "type": "disparity_planeseg",
            "parameter_provider": {"type": "histogram_peak"},
            "update_interval": 2,  # force frequent range refreshes
            "use_temporal_smoothing": True,
        },
    ]

    # max_in_flight=1 makes host-param refreshes land deterministically;
    # under deeper pipelining the refresh lag differs between the full and
    # resumed runs (the reference has the same looseness with 12 concurrent
    # runs mutating a shared provider, planeseg.cu:269-288).
    full = collect(
        build_system(SRC, mods, extra_fetch_keys=["planes"], max_in_flight=1)
    )

    sys_a = build_system(
        SRC, mods, extra_fetch_keys=["planes"], max_frames=5,
        checkpoint_path=ckpt, checkpoint_interval=5, max_in_flight=1,
    )
    collect(sys_a)

    sys_b = build_system(
        SRC, mods, extra_fetch_keys=["planes"], resume_from=ckpt,
        max_in_flight=1,
    )
    resumed = collect(sys_b)

    assert sorted(resumed.keys()) == [6, 7, 8]
    for fid in (6, 7, 8):
        np.testing.assert_array_equal(resumed[fid]["planes"], full[fid]["planes"])


def test_resume_rejects_mismatched_pipeline(tmp_path):
    """A checkpoint saved by a different pipeline must fail loudly:
    same-shaped leaves landing in wrong slots would silently corrupt."""
    import pytest

    from cartslam_tpu.runtime.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, {"a": np.zeros(3), "b": np.ones(3)}, 5)
    state, fid, _ = load_checkpoint(path, {"a": np.zeros(3), "b": np.zeros(3)})
    assert fid == 5 and state["b"].sum() == 3  # matching structure loads

    with pytest.raises(ValueError, match="different[\\s\\S]*structure"):
        load_checkpoint(path, {"a": np.zeros(3), "c": np.zeros(3)})

"""Quality-parity gates on the synthetic ground-truth scene (SURVEY §7
hard parts 2 and 5; VERDICT round-1 item 5).

Thresholds are set ~5% below the measured round-2 values (see BASELINE.md)
so genuine regressions fail while run-to-run jitter passes.  The
stats_refresh='frame' fast path is gated here: it must meet the same
absolute floors as the reference-faithful 'phase' mode (measured: frame
matches or beats phase on every metric).
"""

import numpy as np
import pytest

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.eval_quality import evaluate


FLOORS = {
    "boundary_recall": 0.70,
    "plane_accuracy": 0.90,
    "disp_valid_frac": 0.92,
}
CEILINGS = {
    "underseg_error": 0.12,
    # r5 median-regularized flow: measured 0.045 (was 0.66 unregularized).
    "flow_epe_px": 0.3,
    "disp_med_err_px": 0.3,
}

# The same end-to-end flagship on REAL image statistics (the synthetic
# scene's geometry textured with a photograph — scripts/eval_quality.py
# texture='natural'); measured r5: recall 0.81, underseg 0.08, EPE 0.77,
# plane acc 0.965, disp err 0.11 px @ 98% valid.  Mirrors the reference's
# de-facto validation on real sequences (SURVEY §4.3) with hard floors.
FLOORS_NATURAL = {
    "boundary_recall": 0.72,
    "plane_accuracy": 0.90,
    "disp_valid_frac": 0.92,
}
CEILINGS_NATURAL = {
    "underseg_error": 0.12,
    # r5 median-regularized flow: measured 0.060 on the photo texture.
    "flow_epe_px": 0.3,
    "disp_med_err_px": 0.3,
}


@pytest.fixture(scope="module")
def frame_metrics():
    return evaluate(stats_refresh="frame", frames=8)


@pytest.fixture(scope="module")
def natural_metrics():
    return evaluate(stats_refresh="frame", frames=8, texture="natural")


def test_quality_floors(frame_metrics):
    for k, v in FLOORS.items():
        assert frame_metrics[k] >= v, (k, frame_metrics)


def test_quality_ceilings(frame_metrics):
    for k, v in CEILINGS.items():
        assert frame_metrics[k] <= v, (k, frame_metrics)


def test_quality_floors_natural_imagery(natural_metrics):
    for k, v in FLOORS_NATURAL.items():
        assert natural_metrics[k] >= v, (k, natural_metrics)


def test_quality_ceilings_natural_imagery(natural_metrics):
    for k, v in CEILINGS_NATURAL.items():
        assert natural_metrics[k] <= v, (k, natural_metrics)


def test_flow_recovers_known_pan():
    """Flow endpoint error must beat the zero-flow baseline by a wide
    margin (the GT pan is 2 px, so EPE 1.0 = half the motion captured)."""
    m = evaluate(stats_refresh="frame", frames=4, image_size=(64, 320))
    assert m["flow_epe_px"] < 0.5  # zero-flow baseline would be 2.0

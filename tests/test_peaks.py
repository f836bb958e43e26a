"""Peak finder tests against hand-computed persistence homology."""

import numpy as np

from cartslam_tpu.utils.peaks import find_peaks
from cartslam_tpu.utils.plane_params import (
    HistogramPeakPlaneParameterProvider,
    StaticPlaneParameterProvider,
)


def test_two_peaks_persistence_order():
    data = np.array([0, 1, 5, 1, 0, 2, 8, 2, 0])
    peaks = find_peaks(data)
    assert peaks[0].born == 6  # highest peak survives (infinite persistence)
    assert peaks[1].born == 2
    assert peaks[1].died in (4, 5)  # merged at the valley


def test_monotonic_has_single_peak():
    data = np.arange(10)
    peaks = find_peaks(data)
    assert peaks[0].born == 9
    assert peaks[0].persistence(data) == float("inf")


def test_histogram_peak_provider_ranges():
    hist = np.zeros(256, np.int64)
    # Vertical peak at bin 128 (derivative 0), horizontal peak at bin 160.
    for i in range(256):
        hist[i] = max(0, 100 - 4 * abs(i - 128)) + max(0, 80 - 4 * abs(i - 160))
    p = HistogramPeakPlaneParameterProvider()
    p.update(hist)
    params = p.get()
    assert params.vertical_center == 0
    assert params.horizontal_center == 32
    vr, hr = params.vertical_range, params.horizontal_range
    assert vr[0] < 0 < vr[1]
    assert hr[0] <= 32 <= hr[1]
    # Ranges meet at the valley (planeseg.cu:452-453 share min_index +- 1).
    assert hr[0] == vr[1] - 1 or hr[0] == vr[1]


def test_static_provider():
    p = StaticPlaneParameterProvider((3, 20), (-10, 3))
    r = p.get().ranges_array()
    assert r.tolist() == [[3, 20], [-10, 3]]

"""Host-side visualization modules (reference: §2.4 of the module zoo).

Each consumes fetched numpy outputs and renders BGR uint8 images for the
image sink (window viewer / PNG sampler / video recorder).  Color contracts
follow the reference: plane overlay blue/green/red = horizontal/vertical/
unknown at 50% blend (include/modules/planeseg.hpp:43-71), invalid
disparity painted red (disparity.cu:139-147).
"""

from __future__ import annotations

import numpy as np

from ..runtime.module import Dependency, HostModule
from ..utils.colors import compute_color, index_color

DISPARITY_INVALID = -32768

PLANE_COLORS_BGR = np.array(
    [
        [255, 0, 0],  # HORIZONTAL -> blue
        [0, 255, 0],  # VERTICAL   -> green
        [0, 0, 255],  # UNKNOWN    -> red
    ],
    np.uint8,
)


def _left_bgr(frame):
    img = frame["left"]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img


class DisparityVisualization(HostModule):
    name = "ImageDisparityVisualization"

    def requires(self):
        return [Dependency("disparity")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        disp = fetched["disparity"].astype(np.int32)
        vis = np.clip(disp / 16.0, 0, 255).astype(np.uint8)
        vis = np.repeat(vis[..., None], 3, axis=-1)
        vis[disp == DISPARITY_INVALID] = (0, 0, 255)
        return np.concatenate([_left_bgr(frame), vis], axis=0)


class DerivativeVisualization(HostModule):
    name = "ImageDisparityDerivativeVisualization"

    def requires(self):
        return [Dependency("disparity_derivative")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        deriv = fetched["disparity_derivative"].astype(np.float32)
        dx, dy = deriv[..., 0], deriv[..., 1]
        valid = (deriv[..., 0] != DISPARITY_INVALID) & (
            deriv[..., 1] != DISPARITY_INVALID
        )
        maxrad = np.sqrt(max((dx[valid] ** 2 + dy[valid] ** 2).max(), 1.0)) if valid.any() else 1.0
        img = compute_color(dx / maxrad, dy / maxrad)
        img[~valid] = (0, 255, 255)
        return np.concatenate([_left_bgr(frame), img], axis=0)


class DepthVisualization(HostModule):
    name = "DepthVisualization"

    def requires(self):
        return [Dependency("depth")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        z = fetched["depth"][..., 2]
        img = np.clip(z * (255.0 / 10.0), 0, 255).astype(np.uint8)
        return np.repeat(img[..., None], 3, axis=-1)


class OpticalFlowVisualization(HostModule):
    name = "ImageOpticalFlowVisualization"

    def __init__(self, points: int = 10):
        self.points = points

    def requires(self):
        return [Dependency("optflow")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        if frame_id <= 1:
            return None
        flow = fetched["optflow"].astype(np.float32) / 32.0
        fx, fy = flow[..., 0], flow[..., 1]
        maxrad = np.sqrt(max((fx**2 + fy**2).max(), 1.0))
        img = compute_color(fx / maxrad, fy / maxrad)
        return np.concatenate([_left_bgr(frame), img], axis=0)


class SuperPixelVisualization(HostModule):
    name = "SuperPixelVisualization"

    def requires(self):
        return [Dependency("superpixels")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        labels = fetched["superpixels"]
        img = _left_bgr(frame).copy()
        b = np.zeros(labels.shape, bool)
        b[:, 1:] |= labels[:, 1:] != labels[:, :-1]
        b[:, :-1] |= labels[:, :-1] != labels[:, 1:]
        b[1:, :] |= labels[1:, :] != labels[:-1, :]
        b[:-1, :] |= labels[:-1, :] != labels[1:, :]
        img[b] = (0, 0, 255)
        return img


class PlaneSegmentationVisualization(HostModule):
    name = "PlaneSegmentationVisualization"

    def __init__(self, show_histogram: bool = True, show_unsmoothed: bool = True):
        self.show_histogram = show_histogram
        self.show_unsmoothed = show_unsmoothed

    def requires(self):
        deps = [Dependency("planes"), Dependency("planes_unsmoothed", optional=True)]
        return deps

    def _overlay(self, image, planes):
        colors = PLANE_COLORS_BGR[planes]
        return (image // 2 + colors // 2).astype(np.uint8)

    def render(self, ctx, frame_id, frame, fetched, globals_):
        image = _left_bgr(frame)
        out = {}
        main = self._overlay(image, fetched["planes"])
        if self.show_unsmoothed and "planes_unsmoothed" in fetched:
            un = self._overlay(image, fetched["planes_unsmoothed"])
            main = np.concatenate([main, un], axis=0)
        out["Plane Segmentation"] = main

        if self.show_histogram and "disp_derivative_histogram" in globals_:
            out["Plane Segmentation Histogram"] = self._hist_image(globals_)
        return out

    def _hist_image(self, globals_):
        hist = np.asarray(globals_["disp_derivative_histogram"], np.float64)
        hist_w, hist_h = 1024, 800
        bin_w = hist_w // 256
        img = np.zeros((hist_h, hist_w, 3), np.uint8)
        m = hist.max() if hist.max() > 0 else 1
        norm = (hist / m * (hist_h - 20)).astype(np.int32)

        params = globals_.get("plane_parameters")
        for i in range(256):
            color = (255, 0, 0)
            if params is not None:
                if params.horizontal_range[0] + 128 <= i < params.horizontal_range[1] + 128:
                    color = tuple(int(c) for c in PLANE_COLORS_BGR[0])
                elif params.vertical_range[0] + 128 <= i < params.vertical_range[1] + 128:
                    color = tuple(int(c) for c in PLANE_COLORS_BGR[1])
            h = norm[i]
            img[hist_h - 1 - h : hist_h, i * bin_w : (i + 1) * bin_w] = color
        return img


class BEVVisualization(HostModule):
    """Top-down occupancy of VERTICAL-plane pixels (planeseg_vis.cu:58-107)."""

    name = "PlaneSegmentationBEVVisualization"

    def requires(self):
        return [Dependency("planes"), Dependency("depth")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        planes = fetched["planes"]
        depth = fetched["depth"]
        rows, cols, max_depth = 300, 600, 20.0
        out = np.full((rows, cols, 3), 255, np.uint8)

        mask = planes == 1  # VERTICAL
        x, y, z = depth[..., 0][mask], depth[..., 1][mask], depth[..., 2][mask]
        ok = (z <= max_depth) & (z >= 0.0) & (x >= -10.0) & (x <= 10.0)
        x, y, z = x[ok], y[ok], z[ok]
        max_width = (max_depth / rows) * (cols / 2)
        r = rows - np.round((z / max_depth) * rows).astype(np.int32) - 1
        c = np.round((x / max_width) * cols).astype(np.int32) + cols // 2
        keep = (r >= 0) & (r < rows) & (c >= 0) & (c < cols)
        r, c, y, z = r[keep], c[keep], y[keep], z[keep]
        ch = np.where(y > -0.5, 0, 1)
        dec = np.ceil(1 * (z / 3 + 1)).astype(np.int32)
        for rr, cc, chh, dd in zip(r, c, ch, dec):
            cur = int(out[rr, cc, chh])
            cur = max(cur - dd, 0)
            out[rr, cc, chh] = cur
            out[rr, cc, 2] = cur
        return np.repeat(np.repeat(out, 2, axis=0), 2, axis=1)


class FeatureVisualization(HostModule):
    name = "ImageFeatureVisualization"

    def requires(self):
        return [Dependency("features")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        img = _left_bgr(frame).copy()
        feats = fetched["features"]  # [K, 3] (x, y, valid)
        for x, y, v in feats[:, :3]:
            if v <= 0:
                continue
            x, y = int(x), int(y)
            img[max(y - 1, 0) : y + 2, max(x - 1, 0) : x + 2] = (0, 255, 0)
        return img


class PlaneFitVisualization(HostModule):
    name = "SuperPixelPlaneFitVisualization"

    def requires(self):
        return [Dependency("superpixels")]

    def render(self, ctx, frame_id, frame, fetched, globals_):
        fit = globals_.get("planes_eq")
        if fit is None:
            return None
        labels = fetched["superpixels"]
        assignments = np.asarray(fit["assignments"])
        plane_count = max(len(fit["planes"]), 1)
        assigned = assignments[labels]
        colors = index_color(assigned.astype(np.float32) / plane_count)
        colors[assigned == 0] = 0
        img = _left_bgr(frame)
        return (img // 2 + colors // 2).astype(np.uint8)

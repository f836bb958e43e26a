"""SuperPixelPlaneFitModule — greedy multi-plane RANSAC over superpixels.

Reference: src/modules/planefit.cu:357-445.  The reference ping-pongs
between host RANSAC loops and CUDA inlier-count kernels; here the per-label
plane fits and the [plane x label] inlier counts are single vectorized
device calls (utils/plane_math.py) and only the small greedy adoption loop
stays on host.

Differences from the reference, by design:
  * per-superpixel planes come from vectorized RANSAC (all labels x all
    hypotheses in one device call, utils/plane_math.ransac_label_planes —
    the TPU mapping of plane.cpp:99-180) with fit_method='lsq' available
    as the deterministic closed-form alternative;
  * the reference's progress counter increments for VALID regions
    (planefit.cu:389-394), which makes the 90%-assigned stop trigger
    immediately on clean frames; the obvious intent (count *excluded*
    regions as done) is implemented instead.

Outputs the reference's plane_fit_data_t equivalent into global data:
    planes_eq = {"planes": [P, 4] float, "assignments": [L] int}
(assignment 0 = unassigned, i>0 = planes[i-1], matching planefit.hpp:13-16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.module import Dependency, HostModule
from ..utils import plane_math

KEY_PLANES_EQ = "planes_eq"


@functools.partial(jax.jit, static_argnames=("num_labels", "method"))
def _label_setup(labels, depth, num_labels, method="ransac"):
    z = depth[..., 2]
    valid = jnp.isfinite(z) & (z > 0.0) & (z <= 40.0)
    flat = labels.reshape(-1)
    count = jnp.zeros((num_labels,), jnp.int32).at[flat].add(1)
    invalid = (
        jnp.zeros((num_labels,), jnp.int32)
        .at[flat]
        .add((~valid.reshape(-1)).astype(jnp.int32))
    )
    if method == "ransac":
        # util::segmentPlane's sampling robustness, vectorized over every
        # label at once (plane.cpp:99-180 -> utils/plane_math.py).
        planes, npts = plane_math.ransac_label_planes(
            labels, depth, valid, num_labels
        )
    else:
        planes, npts = plane_math.fit_label_planes(labels, depth, valid, num_labels)
    return count, invalid, planes, npts, valid


@functools.partial(jax.jit, static_argnames=("num_labels",))
def _inliers(labels, depth, valid, planes, num_labels):
    return plane_math.count_plane_inliers_per_label(
        labels, depth, valid, planes, num_labels, threshold=0.02
    )


class SuperPixelPlaneFitModule(HostModule):
    name = "PlaneFit"

    def __init__(
        self,
        num_labels: int,
        max_iters: int = 100,
        target: float = 0.9,
        fit_method: str = "ransac",
    ):
        self.num_labels = num_labels
        self.max_iters = max_iters
        self.target = target
        self.fit_method = fit_method
        self.rng = np.random.RandomState(0)

    def requires(self):
        return [Dependency("superpixels"), Dependency("depth")]

    def _sample_superpixels(self, labels, x_count=4, y_count=3):
        """Jittered-grid superpixel sampling (planefit.cu:329-355)."""
        h, w = labels.shape
        y_step = h // (y_count + 2)
        x_step = w // (x_count + 2)
        out = []
        for y in range(y_step, h, y_step):
            for x in range(x_step, w, x_step):
                xo = x + self.rng.randint(-x_step // 2, x_step // 2 + 1)
                yo = y + self.rng.randint(-y_step // 2, y_step // 2 + 1)
                if 0 <= xo < w and 0 <= yo < h:
                    out.append(int(labels[yo, xo]))
        return out

    def provides_data(self):
        return [KEY_PLANES_EQ]

    def process(self, ctx, frame_id, frame, fetched, globals_):
        labels = fetched["superpixels"]
        depth = fetched["depth"]
        L = self.num_labels

        count, invalid, planes_all, npts, valid = jax.device_get(
            _label_setup(jnp.asarray(labels), jnp.asarray(depth), L, self.fit_method)
        )
        valid_region = invalid < 0.5 * count

        assignments = np.zeros(L, np.int64)
        planes: list[np.ndarray] = []
        # Invalid regions count as excluded-from-work (see module docstring).
        done = int((~valid_region).sum())

        it = 0
        while done / L < self.target and it < self.max_iters:
            it += 1
            sample = self._sample_superpixels(labels)
            cands = [
                l
                for l in dict.fromkeys(sample)
                if assignments[l] == 0
                and valid_region[l]
                and npts[l] >= 16
                and np.linalg.norm(planes_all[l]) > 0
            ]
            if len(cands) <= 3:
                continue
            local = planes_all[cands]
            inl = np.asarray(
                _inliers(jnp.asarray(labels), jnp.asarray(depth), jnp.asarray(valid),
                         jnp.asarray(local), L)
            )  # [P, L]

            # attemptAssignment (planefit.cu:286-326): a label is acceptable
            # for a plane when inliers > 0.5 * pixelCount; adopt the plane
            # covering the most labels.
            eligible = (
                (assignments == 0)
                & valid_region
                & (inl > 0.5 * np.maximum(count, 1))
            )  # [P, L]
            per_plane = eligible.sum(axis=1)
            best = int(per_plane.argmax())
            accept = np.where(eligible[best])[0]
            if len(accept) < 16:
                continue
            planes.append(local[best])
            assignments[accept] = len(planes)
            done += len(accept)

        planes_eq = {
            "planes": np.array(planes) if planes else np.zeros((0, 4)),
            "assignments": assignments,
        }
        # Per-run data key (reference: planefit.hpp:9-16 provides planes_eq
        # through the promise store); globals_ keeps the latest copy for
        # consumers outside the retention window.
        globals_[KEY_PLANES_EQ] = planes_eq
        return {KEY_PLANES_EQ: planes_eq}

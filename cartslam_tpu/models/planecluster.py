"""SuperPixelPlaneClusterModule — per-superpixel planes + region growing.

Reference: src/modules/planecluster.cpp.  The per-label plane fits (the
expensive part — an OpenMP RANSAC per superpixel there) are one vectorized
device call; the region-growing merge over the ~4k-label adjacency graph
stays on host, preserving the reference's merge rule: neighbors join a
cluster when |d sin yaw| + |d cos yaw| < 0.2, same for pitch, and
|d offset| < 3; clusters below 32 labels are dropped
(planecluster.cpp:98-167).
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
def _fit(labels, depth, num_labels, method="ransac"):
    z = depth[..., 2]
    valid = jnp.isfinite(z) & (z > 0.0) & (z <= 40.0)
    if method == "ransac":
        # The reference RANSAC-fits every superpixel (planecluster.cpp:46-68
        # via util::segmentPlane); vectorized hypothesis sampling is its
        # direct TPU mapping and keeps the outlier robustness.
        planes, npts = plane_math.ransac_label_planes(
            labels, depth, valid, num_labels
        )
    else:
        planes, npts = plane_math.fit_label_planes(labels, depth, valid, num_labels)
    return planes, npts


def _adjacency_edges(labels: np.ndarray, num_labels: int) -> np.ndarray:
    """Unique label adjacency edges [E, 2] from the 4 shift comparisons,
    vectorized: pack each boundary pair into one int64, np.unique once —
    no Python loop over pixels (planecluster.cpp:70-93 builds the same
    graph)."""
    h, w = labels.shape
    lab = labels.astype(np.int64)
    pairs = []
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        y0, y1 = max(0, -dy), min(h, h - dy)
        x0, x1 = max(0, -dx), min(w, w - dx)
        a = lab[y0:y1, x0:x1].reshape(-1)
        b = lab[y0 + dy : y1 + dy, x0 + dx : x1 + dx].reshape(-1)
        m = a != b
        a, b = a[m], b[m]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        pairs.append(lo * num_labels + hi)
    uniq = np.unique(np.concatenate(pairs)) if pairs else np.zeros(0, np.int64)
    return np.stack([uniq // num_labels, uniq % num_labels], axis=-1)


def _adjacency(labels: np.ndarray, num_labels: int) -> list[set[int]]:
    edges = _adjacency_edges(labels, num_labels)
    neigh: list[set[int]] = [set() for _ in range(num_labels)]
    for x, y in zip(edges[:, 0].tolist(), edges[:, 1].tolist()):
        neigh[x].add(y)
        neigh[y].add(x)
    return neigh


class SuperPixelPlaneClusterModule(HostModule):
    name = "PlaneCluster"

    def __init__(
        self,
        num_labels: int,
        min_cluster: int = 32,
        min_points: int = 16,
        fit_method: str = "ransac",
    ):
        self.num_labels = num_labels
        self.min_cluster = min_cluster
        self.min_points = min_points
        self.fit_method = fit_method

    def requires(self):
        return [Dependency("superpixels"), Dependency("depth")]

    def provides_data(self):
        return [KEY_PLANES_EQ]

    def process(self, ctx, frame_id, frame, fetched, globals_):
        labels = np.asarray(fetched["superpixels"])
        depth = np.asarray(fetched["depth"])
        L = self.num_labels

        planes, npts = jax.device_get(
            _fit(jnp.asarray(labels), jnp.asarray(depth), L, self.fit_method)
        )
        norms = np.linalg.norm(planes[:, :3], axis=-1)
        ok = (npts >= self.min_points) & (norms > 0)

        from .. import native

        if native.available():
            # The same region growing the reference runs natively
            # (planecluster.cpp:98-167), as a C++ core over the vectorized
            # edge list; the Python BFS below is the fallback.
            edges = _adjacency_edges(labels, L)
            assignments, cplanes = native.grow_clusters(
                L, edges, planes.astype(np.float64), ok,
                yaw_pitch_thresh=0.2, d_thresh=3.0,
                min_cluster=self.min_cluster,
            )
            planes_eq = {
                "planes": cplanes if len(cplanes) else np.zeros((0, 4)),
                "assignments": assignments,
            }
            globals_[KEY_PLANES_EQ] = planes_eq
            return {KEY_PLANES_EQ: planes_eq}

        # Orientation stats (planecluster.cpp:57-68).
        a, b, c, d = planes.T
        length = np.linalg.norm(planes[:, :3], axis=-1)
        yaw = np.arctan2(b, a)
        pitch = np.arctan2(c, np.maximum(length, 1e-12))
        ys, yc = np.sin(yaw), np.cos(yaw)
        ps, pc = np.sin(pitch), np.cos(pitch)

        neigh = _adjacency(labels, L)
        assignments = np.zeros(L, np.int64)
        clusters: list[np.ndarray] = []

        for seed in range(L):
            if assignments[seed] != 0 or not ok[seed]:
                continue
            similar = [seed]
            seen = {seed}
            frontier = set(neigh[seed])
            while frontier:
                other = frontier.pop()
                seen.add(other)
                if not ok[other]:
                    continue
                yaw_diff = abs(ys[seed] - ys[other]) + abs(yc[seed] - yc[other])
                pitch_diff = abs(ps[seed] - ps[other]) + abs(pc[seed] - pc[other])
                d_diff = abs(d[seed] - d[other])
                if yaw_diff < 0.2 and pitch_diff < 0.2 and d_diff < 3:
                    cur = assignments[other]
                    if cur != 0:
                        # Keep the more similar assignment
                        # (planecluster.cpp:131-141).
                        cs = clusters[cur - 1]
                        cy = abs(np.sin(np.arctan2(cs[1], cs[0])) - ys[other]) + abs(
                            np.cos(np.arctan2(cs[1], cs[0])) - yc[other]
                        )
                        cl = np.linalg.norm(cs[:3])
                        cp_ = np.arctan2(cs[2], max(cl, 1e-12))
                        cp = abs(np.sin(cp_) - ps[other]) + abs(np.cos(cp_) - pc[other])
                        if cy + cp + d_diff < yaw_diff + pitch_diff + d_diff:
                            continue
                    similar.append(other)
                    for nb in neigh[other]:
                        if nb not in seen:
                            frontier.add(nb)
            if len(similar) < self.min_cluster:
                continue
            clusters.append(planes[seed])
            for l in similar:
                assignments[l] = len(clusters)

        planes_eq = {
            "planes": np.array(clusters) if clusters else np.zeros((0, 4)),
            "assignments": assignments,
        }
        globals_[KEY_PLANES_EQ] = planes_eq
        return {KEY_PLANES_EQ: planes_eq}

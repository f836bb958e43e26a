"""ZED-format stereo source.

The ZED SDK / SVO playback (reference: src/sources/zed.cpp) is CUDA-only
hardware IP; on TPU hosts we keep the *module contract* — a stereo pair plus
an optional SDK-style float disparity measure ('zed_disparity', consumed by
the zed_disparity module, src/modules/disparity/disparity.cu:18-45) — over
two interchangeable container formats:

  * a directory of frames:  left/NNNNNN.png, right/NNNNNN.png,
    optional disparity/NNNNNN.npy (float32), and intrinsics.json
    {"fx":, "fy":, "cx":, "cy":, "baseline":, "cx_right": optional}
  * a single .npz archive with arrays left [N,H,W,3], right [N,H,W,3],
    optional disparity [N,H,W] float32, and scalars fx, cx, cy, baseline.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .base import DataSource, DecodePrefetcher, resize_bgr
from ..utils.imageio import imread_bgr


def _build_q(fx, cx, cy, baseline, cx_right=None, sw=1.0, sh=1.0):
    q = np.eye(4, dtype=np.float32)
    q[0, 3] = -cx * sw
    q[1, 3] = -cy * sh
    q[2, 2] = 0.0
    q[2, 3] = fx * sw
    q[3, 2] = -1.0 / baseline
    q[3, 3] = ((cx - (cx_right if cx_right is not None else cx)) * sw) / baseline
    return q


class ZEDDataSource(DataSource):
    def __init__(
        self,
        path: str,
        include_disparity: bool = False,
        image_size: tuple[int, int] | None = None,
        real_time_mode: bool = False,
        fps: float = 15.0,
        decode_workers: int = 6,
    ):
        """real_time_mode paces playback at the recording's fps — the
        CARTSLAM_ZED_REALTIME_MODE option (src/sources/zed.cpp:16-18), as a
        runtime flag instead of a compile-time define."""
        super().__init__(image_size)
        path = os.path.expanduser(path)
        self.include_disparity = include_disparity
        self.real_time_mode = real_time_mode
        self.fps = fps
        # Dir-format 720p PNGs decode at ~40 ms each; pooled read-ahead
        # keeps the source above the device step rate (see
        # base.DecodePrefetcher); the npz path reads memory-mapped arrays
        # and needs none.
        self.decode_workers = decode_workers
        self._t0: float | None = None
        self._frame = 0

        if path.endswith(".npz"):
            data = np.load(path)
            self._npz = data
            self._num = data["left"].shape[0]
            native = data["left"].shape[1:3]
            self._dir = None
        else:
            self._npz = None
            self._dir = path
            lefts = sorted(os.listdir(os.path.join(path, "left")))
            self._num = len(lefts)
            first = imread_bgr(os.path.join(path, "left", lefts[0]))
            native = first.shape[:2]

        if self.image_size is None:
            self.image_size = tuple(native)
        sh = self.image_size[0] / native[0]
        sw = self.image_size[1] / native[1]

        if self._npz is not None:
            meta = {k: float(self._npz[k]) for k in ("fx", "cx", "cy", "baseline")}
            cx_right = float(self._npz["cx_right"]) if "cx_right" in self._npz else None
        else:
            with open(os.path.join(path, "intrinsics.json")) as f:
                meta = json.load(f)
            cx_right = meta.get("cx_right")
        self.intrinsics.q = _build_q(
            meta["fx"], meta["cx"], meta["cy"], meta["baseline"], cx_right, sw, sh
        )

    def is_next_ready(self) -> bool:
        if self._frame >= self._num:
            return False
        if self.real_time_mode:
            import time

            if self._t0 is None:
                self._t0 = time.monotonic()
            due = self._t0 + self._frame / self.fps
            return time.monotonic() >= due
        return True

    def is_finished(self) -> bool:
        return self._frame >= self._num

    def get_next(self):
        if self.is_finished():
            return None
        if self.real_time_mode:
            import time

            while not self.is_next_ready():
                time.sleep(0.001)
        i = self._frame
        self._frame += 1
        if self._npz is not None:
            left = np.asarray(self._npz["left"][i])
            right = np.asarray(self._npz["right"][i])
            disp = (
                np.asarray(self._npz["disparity"][i], dtype=np.float32)
                if self.include_disparity and "disparity" in self._npz
                else None
            )
        else:
            for ahead in range(self.decode_workers // 2 + 1):
                self._submit_dir(i + ahead)
            left, right = self._prefetcher().take(i)
            dpath = os.path.join(self._dir, "disparity", f"{i:06d}.npy")
            disp = (
                np.load(dpath).astype(np.float32)
                if self.include_disparity and os.path.exists(dpath)
                else None
            )
        out = {
            "left": resize_bgr(left, self.image_size),
            "right": resize_bgr(right, self.image_size),
        }
        if self.include_disparity:
            if disp is None:
                disp = np.full(self.image_size, np.inf, np.float32)
            out["zed_disparity"] = disp
        return out

    def _prefetcher(self) -> DecodePrefetcher:
        if not hasattr(self, "_decode"):
            self._decode = DecodePrefetcher(
                self.decode_workers, name="zed-decode"
            )
        return self._decode

    def _submit_dir(self, i: int) -> None:
        pf = self._prefetcher()
        if i >= self._num or pf.has(i):
            return
        paths = [
            os.path.join(self._dir, side, f"{i:06d}.png")
            for side in ("left", "right")
        ]
        pf.submit(i, [lambda p=p: imread_bgr(p) for p in paths])

    def skip(self, n: int) -> None:
        """Seek past the first n frames (checkpoint resume)."""
        self._frame = n
        if hasattr(self, "_decode"):
            self._decode.clear()

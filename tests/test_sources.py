"""Data-source layer tests: KITTI calib/Q parsing and the ZED dir/npz
contract (the reference's L2, src/sources/{kitti,zed}.cpp)."""

import json
import os

import numpy as np
import pytest

from cartslam_tpu.sources.kitti import KITTIDataSource
from cartslam_tpu.sources.zed import ZEDDataSource
from cartslam_tpu.utils.imageio import imwrite_bgr


def _mini_kitti(root, frames=3, h=40, w=96):
    seq = os.path.join(root, "sequences", "00")
    for cam in (2, 3):
        os.makedirs(os.path.join(seq, f"image_{cam}"), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(frames):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        imwrite_bgr(os.path.join(seq, "image_2", f"{i:06d}.png"), img)
        imwrite_bgr(os.path.join(seq, "image_3", f"{i:06d}.png"), img)
    # P matrices: fx=fy=100, cx=48, cy=20; P2 x-offset -10 (baseline 0.1),
    # P3 cx shifted by 2 to exercise the Q[3,3] term.
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: 100 0 48 0  0 100 20 0  0 0 1 0\n")
        f.write("P1: 100 0 48 0  0 100 20 0  0 0 1 0\n")
        f.write("P2: 100 0 48 -10  0 100 20 0  0 0 1 0\n")
        f.write("P3: 100 0 46 -50  0 100 20 0  0 0 1 0\n")
    return root


def test_kitti_calib_and_q(tmp_path):
    _mini_kitti(str(tmp_path))
    src = KITTIDataSource(str(tmp_path), sequence=0)
    q = src.get_camera_intrinsics().q
    # fx/cx/cy from the LEFT cam; baseline = -P2(0,3)/fx = 0.1 (kitti.cpp
    # quirk reproduced: the left cam's own offset).
    assert q[2, 3] == pytest.approx(100.0)
    assert q[0, 3] == pytest.approx(-48.0)
    assert q[1, 3] == pytest.approx(-20.0)
    assert q[3, 2] == pytest.approx(-1.0 / 0.1)
    assert q[3, 3] == pytest.approx((48.0 - 46.0) / 0.1)

    n = 0
    while not src.is_finished():
        f = src.get_next()
        assert f["left"].shape == (40, 96, 3) and f["left"].dtype == np.uint8
        n += 1
    assert n == 3
    src.skip(1)
    assert not src.is_finished()


def test_zed_npz_source_and_module(tmp_path):
    h, w, n = 32, 64, 3
    rng = np.random.RandomState(1)
    disp = rng.uniform(-60, -5, (n, h, w)).astype(np.float32)
    disp[:, :4, :] = np.inf  # SDK fills missing with inf
    np.savez(
        tmp_path / "rec.npz",
        left=rng.randint(0, 255, (n, h, w, 3), dtype=np.uint8),
        right=rng.randint(0, 255, (n, h, w, 3), dtype=np.uint8),
        disparity=disp,
        fx=100.0, cx=32.0, cy=16.0, baseline=0.12,
    )
    src = ZEDDataSource(str(tmp_path / "rec.npz"), include_disparity=True)
    assert src.get_image_size() == (h, w)
    f = src.get_next()
    assert f["zed_disparity"].shape == (h, w)

    # zed_disparity module contract: float measure * -16 -> int16, inf ->
    # invalid (disparity.cu:18-45).
    from cartslam_tpu.config import build_system

    system = build_system(
        {"type": "zed", "path": str(tmp_path / "rec.npz"),
         "include_disparity": True},
        [{"type": "zed_disparity"}],
        extra_fetch_keys=["disparity"],
    )
    got = {}
    system.run(on_frame=lambda fid, out: got.update({fid: out}))
    assert sorted(got) == [1, 2, 3]
    d = got[1]["disparity"]
    assert d.dtype == np.int16
    assert (d[:4, :] == -32768).all()
    expect = np.clip(disp[0, 10] * -16.0, -32768, 32767).astype(np.int32)
    np.testing.assert_array_equal(d[10].astype(np.int32), expect)


def test_zed_realtime_pacing(tmp_path):
    import time

    h, w, n = 8, 16, 3
    rng = np.random.RandomState(2)
    np.savez(
        tmp_path / "rt.npz",
        left=rng.randint(0, 255, (n, h, w, 3), dtype=np.uint8),
        right=rng.randint(0, 255, (n, h, w, 3), dtype=np.uint8),
        fx=10.0, cx=8.0, cy=4.0, baseline=0.1,
    )
    src = ZEDDataSource(
        str(tmp_path / "rt.npz"), real_time_mode=True, fps=50.0
    )
    t0 = time.monotonic()
    while not src.is_finished():
        src.get_next()
    # 3 frames at 50 fps: the 3rd is due at t0 + 2/50 = 40 ms.
    assert time.monotonic() - t0 >= 0.04


def test_zed_dir_source_prefetch(tmp_path):
    """Dir-format ZED source: pooled decode read-ahead returns the right
    frames in order, and skip() drops stale prefetched decodes."""
    from cartslam_tpu.utils.imageio import imwrite_bgr

    h, w, n = 16, 32, 4
    rng = np.random.RandomState(2)
    (tmp_path / "left").mkdir()
    (tmp_path / "right").mkdir()
    frames = []
    for i in range(n):
        l = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        r = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        imwrite_bgr(str(tmp_path / "left" / f"{i:06d}.png"), l)
        imwrite_bgr(str(tmp_path / "right" / f"{i:06d}.png"), r)
        frames.append((l, r))
    (tmp_path / "intrinsics.json").write_text(
        '{"fx": 100.0, "cx": 16.0, "cy": 8.0, "baseline": 0.1}'
    )

    src = ZEDDataSource(str(tmp_path), decode_workers=4)
    assert src.get_image_size() == (h, w)
    for i in range(2):
        f = src.get_next()
        np.testing.assert_array_equal(f["left"], frames[i][0])
        np.testing.assert_array_equal(f["right"], frames[i][1])

    src2 = ZEDDataSource(str(tmp_path), decode_workers=4)
    src2.get_next()  # prefetches ahead
    src2.skip(3)
    f = src2.get_next()
    np.testing.assert_array_equal(f["left"], frames[3][0])
    assert src2.is_finished()

"""PLY loading + bare-geometry cloud initialization."""

import os

import numpy as np
import pytest

from pointnerf2studio_tpu.data.pointcloud_init import (
    init_cloud_from_points, load_ply)

PTS = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6], [-0.1, -0.2, -0.3],
                [0.9, 0.8, 0.7]], np.float32)
COL = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [128, 128, 128]],
               np.uint8)


def write_ascii(path):
    with open(path, "wb") as f:
        f.write(b"ply\nformat ascii 1.0\n")
        f.write(b"element vertex 4\n")
        for p in "xyz":
            f.write(f"property float {p}\n".encode())
        for c in ("red", "green", "blue"):
            f.write(f"property uchar {c}\n".encode())
        f.write(b"end_header\n")
        for p, c in zip(PTS, COL):
            f.write((" ".join(f"{v:.6f}" for v in p) + " "
                     + " ".join(str(int(v)) for v in c) + "\n").encode())


def write_binary(path):
    dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    rec = np.zeros(4, dt)
    rec["x"], rec["y"], rec["z"] = PTS.T
    rec["red"], rec["green"], rec["blue"] = COL.T
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\n")
        for p in "xyz":
            f.write(f"property float {p}\n".encode())
        for c in ("red", "green", "blue"):
            f.write(f"property uchar {c}\n".encode())
        f.write(b"end_header\n")
        f.write(rec.tobytes())


@pytest.mark.parametrize("writer", [write_ascii, write_binary])
def test_load_ply(tmp_path, writer):
    p = str(tmp_path / "cloud.ply")
    writer(p)
    d = load_ply(p)
    np.testing.assert_allclose(d["xyz"], PTS, atol=1e-5)
    np.testing.assert_allclose(d["color"][0], [1.0, 0.0, 0.0], atol=1e-2)


def test_init_cloud(tmp_path):
    write_binary(str(tmp_path / "c.ply"))
    d = load_ply(str(tmp_path / "c.ply"))
    cloud = init_cloud_from_points(d["xyz"], d["color"], feat_dim=16,
                                   capacity=8)
    assert cloud.capacity == 8
    assert int(np.asarray(cloud.num_alive)) == 4
    assert cloud.points_embeding.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(cloud.xyz[:4]), PTS, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cloud.points_conf[:4]), 0.3)


def test_init_cloud_range_filter():
    cloud = init_cloud_from_points(
        PTS, None, feat_dim=8,
        ranges=(-0.5, -0.5, -0.5, 0.5, 0.5, 0.5))
    # point (0.9, 0.8, 0.7) and (0.4,0.5,0.6)? 0.5<=0.5 kept; 0.6 > 0.5
    assert int(np.asarray(cloud.num_alive)) == 2


def test_init_points_from_depth():
    from pointnerf2studio_tpu.data.pointcloud_init import (
        init_points_from_depth)
    H = W = 8
    K = np.array([[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)
    # one camera at origin looking +z, constant depth 2 -> plane z=2
    depths = np.full((1, H, W), 2.0, np.float32)
    depths[0, 0, 0] = 0.0      # invalid pixel dropped
    poses = np.eye(4, dtype=np.float32)[None]
    imgs = np.full((1, H, W, 3), 0.25, np.float32)
    xyz, color = init_points_from_depth(depths, poses, K, images=imgs)
    assert xyz.shape == (H * W - 1, 3)
    np.testing.assert_allclose(xyz[:, 2], 2.0, atol=1e-5)
    np.testing.assert_allclose(color, 0.25)
    # center pixel unprojects near the optical axis
    assert np.abs(xyz[:, :2]).max() < 1.0


def test_stage_timer_and_rate_meter():
    import jax.numpy as jnp
    from pointnerf2studio_tpu.utils.profiling import RateMeter, StageTimer
    st = StageTimer()
    out = st.stage("add", lambda: jnp.ones(8) + 1)
    assert float(out[0]) == 2.0
    rep = st.report()
    assert "add" in rep and "total" in rep
    rm = RateMeter()
    assert rm.tick() == {}
    r = rm.tick(n_items=100)
    assert r["items_per_sec"] > 0


def test_logger_tensorboard_export(tmp_path):
    """Logger(tensorboard=True) writes scalar events (reference
    visualizer.py:176-182 tensorboardX parity)."""
    import glob

    from pointnerf2studio_tpu.utils.logger import Logger
    lg = Logger(str(tmp_path), tensorboard=True)
    lg.accumulate({"coarse_raycolor_loss": 0.01})
    lg.flush(10)
    ev = glob.glob(str(tmp_path / "tensorboard" / "events.out.*"))
    assert ev and os.path.getsize(ev[0]) > 0

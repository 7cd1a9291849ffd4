"""ScanNet / NSVF(T&T) / DTU loaders over tiny synthetic directories."""

import os

import numpy as np
import pytest

from pointnerf2studio_tpu.data.scenes import (
    load_dtu, load_nsvf, load_scannet, load_scene)

H = W = 8


def write_png(path, value):
    from PIL import Image
    arr = np.full((H, W, 3), int(value * 255), np.uint8)
    Image.fromarray(arr).save(path)


def make_pose(i):
    p = np.eye(4, dtype=np.float32)
    p[0, 3] = float(i)
    return p


@pytest.fixture
def scannet_dir(tmp_path):
    exp = tmp_path / "exported"
    for d in ("color", "pose", "intrinsic"):
        (exp / d).mkdir(parents=True)
    np.savetxt(exp / "intrinsic" / "intrinsic_color.txt",
               np.diag([10.0, 10.0, 1.0, 1.0]))
    for i in range(12):
        write_png(exp / "color" / f"{i}.jpg", i / 12)
        np.savetxt(exp / "pose" / f"{i}.txt", make_pose(i))
    return str(tmp_path)


class TestScanNet:
    def test_split_and_shapes(self, scannet_dir):
        tr = load_scannet(scannet_dir, "train", test_every=4)
        te = load_scannet(scannet_dir, "test", test_every=4)
        assert tr.num_views == 9 and te.num_views == 3
        assert tr.images.shape == (9, H, W, 3)
        assert tr.intrinsics[0, 0] == 10.0
        # frame 0 is a test frame (rank 0 % 4 == 0)
        assert te.poses[0, 0, 3] == 0.0
        assert tr.poses[0, 0, 3] == 1.0

    def test_skips_invalid_pose(self, scannet_dir):
        np.savetxt(os.path.join(scannet_dir, "exported", "pose", "1.txt"),
                   np.full((4, 4), np.inf))
        tr = load_scannet(scannet_dir, "train", test_every=4)
        assert tr.num_views == 8


@pytest.fixture
def nsvf_dir(tmp_path):
    (tmp_path / "rgb").mkdir()
    (tmp_path / "pose").mkdir()
    np.savetxt(tmp_path / "intrinsics.txt",
               np.array([[12.0, 0, 4, 0], [0, 12.0, 4, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1]]))
    for s, n in (("0", 4), ("2", 2)):
        for i in range(n):
            write_png(tmp_path / "rgb" / f"{s}_{i:04d}.png", 0.5)
            np.savetxt(tmp_path / "pose" / f"{s}_{i:04d}.txt", make_pose(i))
    return str(tmp_path)


class TestNSVF:
    def test_split_by_prefix(self, nsvf_dir):
        tr = load_nsvf(nsvf_dir, "train")
        te = load_nsvf(nsvf_dir, "test")
        assert tr.num_views == 4 and te.num_views == 2
        assert tr.intrinsics[0, 0] == 12.0
        np.testing.assert_allclose(tr.images, 0.5, atol=0.01)

    def test_factory(self, nsvf_dir):
        ds = load_scene("tt", nsvf_dir, split="train")
        assert ds.num_views == 4


@pytest.fixture
def dtu_dir(tmp_path):
    cams = tmp_path / "Cameras" / "train"
    cams.mkdir(parents=True)
    rect = tmp_path / "Rectified" / "scan1_train"
    rect.mkdir(parents=True)
    for i in range(6):
        w2c = np.eye(4)
        w2c[2, 3] = -float(i)      # camera at z=i
        lines = ["extrinsic"]
        lines += [" ".join(str(v) for v in row) for row in w2c]
        lines += ["", "intrinsic"]
        K = np.diag([20.0, 20.0, 1.0])
        K[0, 2] = K[1, 2] = 4.0
        lines += [" ".join(str(v) for v in row) for row in K]
        lines += ["", "425.0 2.5"]
        (cams / f"{i:08d}_cam.txt").write_text("\n".join(lines))
        write_png(rect / f"rect_{i + 1:03d}_3_r5000.png", 0.25)
    return str(tmp_path)


class TestDTU:
    def test_loads_and_inverts_extrinsics(self, dtu_dir):
        ds = load_dtu(dtu_dir, scan="scan1", split="train",
                      test_views=(2,))
        assert ds.num_views == 5
        # c2w = inv(w2c): camera 1 sits at +z = 1 (w2c translated -1)
        i1 = [v for v in range(6) if v != 2][1]
        np.testing.assert_allclose(ds.poses[1, 2, 3], float(i1), atol=1e-5)
        assert ds.near == 425.0
        te = load_dtu(dtu_dir, scan="scan1", split="test", test_views=(2,))
        assert te.num_views == 1

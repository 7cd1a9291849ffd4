"""Blender dataset loader tests on a tiny generated scene."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pointnerf2studio_tpu.data.blender import (
    BLENDER2OPENCV, BlenderDataset, PixelSampler, load_blender)


def look_at_pose(campos, target=np.zeros(3)):
    """Blender-convention c2w (camera looks down its -z)."""
    fwd = target - campos
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.array([0.0, 0.0, 1.0]))
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, -fwd, campos
    return m


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender_scene")
    h = w = 16
    frames = []
    for i, theta in enumerate(np.linspace(0, 2 * np.pi, 4, endpoint=False)):
        campos = 4.0 * np.array([np.cos(theta), np.sin(theta), 0.5])
        pose = look_at_pose(campos)
        # RGBA image: red square on transparent bg
        img = np.zeros((h, w, 4), np.uint8)
        img[4:12, 4:12] = [255, 0, 0, 255]
        (root / "train").mkdir(exist_ok=True)
        Image.fromarray(img).save(root / "train" / f"r_{i}.png")
        frames.append({
            "file_path": f"train/r_{i}",
            "transform_matrix": pose.tolist(),
        })
    meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    return str(root)


class TestLoad:
    def test_shapes_and_intrinsics(self, blender_root):
        ds = load_blender(blender_root, "train")
        assert ds.images.shape == (4, 16, 16, 3)
        assert ds.poses.shape == (4, 4, 4)
        focal = 0.5 * 16 / np.tan(0.5 * 0.6911112070083618)
        np.testing.assert_allclose(ds.intrinsics[0, 0], focal, rtol=1e-6)
        assert (ds.near, ds.far) == (2.0, 6.0)

    def test_white_background_compositing(self, blender_root):
        ds = load_blender(blender_root, "train")
        np.testing.assert_allclose(ds.images[0, 0, 0], [1, 1, 1])   # transparent -> white
        np.testing.assert_allclose(ds.images[0, 8, 8], [1, 0, 0])   # red square

    def test_center_ray_hits_origin(self, blender_root):
        """The central pixel's ray must pass near the world origin
        (cameras look at the origin); validates the blender->opencv
        conversion + raydir math end to end."""
        ds = load_blender(blender_root, "train")
        for v in range(ds.num_views):
            d = ds.raydirs(v, np.array([[8, 8]]))[0]
            campos = ds.campos(v)
            # distance from origin to the ray line
            t = -np.dot(campos, d)
            closest = campos + t * d
            assert t > 0, "origin must be in front of the camera"
            assert np.linalg.norm(closest) < 0.2, (
                f"view {v}: ray misses origin by {np.linalg.norm(closest)}")

    def test_factor_downsampling(self, blender_root):
        ds = load_blender(blender_root, "train", factor=2)
        assert ds.images.shape == (4, 8, 8, 3)
        assert ds.intrinsics[0, 2] == 4.0


class TestSampler:
    def test_batch_contents(self, blender_root):
        ds = load_blender(blender_root, "train")
        sampler = PixelSampler(ds, rays_per_batch=64, seed=1)
        b = sampler.next_batch()
        assert b["raydirs"].shape == (64, 3)
        assert b["gt_rgb"].shape == (64, 3)
        np.testing.assert_allclose(
            np.linalg.norm(b["raydirs"], axis=-1), 1.0, atol=1e-4)
        assert 0 <= b["view"] < 4

    def test_gt_matches_image(self, blender_root):
        ds = load_blender(blender_root, "train")
        sampler = PixelSampler(ds, rays_per_batch=256, seed=2)
        b = sampler.next_batch()
        # every gt pixel is either white (bg) or red (square)
        is_white = np.all(b["gt_rgb"] == 1.0, -1)
        is_red = np.all(b["gt_rgb"] == [1, 0, 0], -1)
        assert np.all(is_white | is_red)
        assert is_red.any() and is_white.any()

    def test_patch_mode_contiguous(self, blender_root):
        """patch mode = one contiguous square (reference --random_sample
        patch, nerf_synth360_ft_dataset.py:590-596)."""
        ds = load_blender(blender_root, "train")
        sampler = PixelSampler(ds, rays_per_batch=16, seed=3,
                               mode="patch")
        b = sampler.next_batch()
        xy = b["pixel_xy"]
        xs, ys = np.unique(xy[:, 0]), np.unique(xy[:, 1])
        assert len(xs) == 4 and len(ys) == 4
        assert xs.max() - xs.min() == 3 and ys.max() - ys.min() == 3

    def test_random2_mode_floats(self, blender_root):
        """random2 = continuous coords; gt indexed by floor
        (reference :600-608)."""
        ds = load_blender(blender_root, "train")
        sampler = PixelSampler(ds, rays_per_batch=64, seed=4,
                               mode="random2")
        b = sampler.next_batch()
        h, w = ds.hw
        xy = b["pixel_xy"]
        assert (xy[:, 0] < w).all() and (xy[:, 1] < h).all()
        np.testing.assert_array_equal(
            b["gt_rgb"], ds.images[b["view"], xy[:, 1], xy[:, 0]])

    def test_no_crop_full_grid(self, blender_root):
        ds = load_blender(blender_root, "train")
        sampler = PixelSampler(ds, rays_per_batch=0, seed=5,
                               mode="no_crop")
        b = sampler.next_batch()
        h, w = ds.hw
        assert b["raydirs"].shape == (h * w, 3)


class TestCameraTriangles:
    def test_sphere_rig_triangulated(self):
        from pointnerf2studio_tpu.data.mvs_batches import camera_triangles
        rng = np.random.default_rng(0)
        v = rng.normal(size=(20, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        t = camera_triangles(v * 4.0)
        # closed surface triangulation of V points: 2V - 4 triangles
        assert t.shape == (36, 3)
        assert set(np.unique(t)) == set(range(20))


class TestPairFiles:
    """Pair-list parsing against the reference's SHIPPED real artifacts
    (the only real-data files in-tree; reference reads them at
    nerf_synth_ft_dataset.py:121,279-296)."""

    DTU_DIR = "/root/reference/pointnerf/data/dtu_configs"

    def test_shipped_mvsnet_pairs(self):
        from pointnerf2studio_tpu.data.mvs_batches import load_mvsnet_pairs
        path = os.path.join(self.DTU_DIR, "dtu_pairs.txt")
        if not os.path.exists(path):
            pytest.skip("reference dtu_pairs.txt not present")
        triples = load_mvsnet_pairs(path)
        assert len(triples) == 49          # DTU rig has 49 views
        for t in triples:
            assert len(t) == 11            # ref + 10 scored sources
            assert all(0 <= v < 49 for v in t)
            assert t[0] not in t[1:]

    def test_shipped_finetune_init_pairs(self):
        from pointnerf2studio_tpu.data.mvs_batches import load_pair_list
        path = os.path.join(self.DTU_DIR, "dtu_finetune_init_pairs.txt")
        if not os.path.exists(path):
            pytest.skip("reference dtu_finetune_init_pairs.txt absent")
        triples = load_pair_list(path)
        assert len(triples) == 16
        assert all(len(t) == 5 for t in triples)   # ref + 4 sources
        assert all(0 <= v < 49 for t in triples for v in t)

    def test_shipped_pairs_th_splits(self):
        from pointnerf2studio_tpu.data.mvs_batches import load_dtu_split_ids
        path = os.path.join(self.DTU_DIR, "pairs.th")
        if not os.path.exists(path):
            pytest.skip("reference pairs.th not present")
        # pairs.th keys scans from NeRF-Synthetic, LLFF, and DTU rigs
        train = load_dtu_split_ids(path, "chair", "train")
        test = load_dtu_split_ids(path, "chair", "test")
        assert train and test
        assert not (set(train) & set(test))
        assert all(v >= 0 for v in train + test)

    def test_file_pairing_builds_batches(self, blender_root):
        from pointnerf2studio_tpu.data.mvs_batches import build_view_batches
        ds = load_blender(str(blender_root), "train")
        pf = os.path.join(str(blender_root), "pairs.txt")
        with open(pf, "w") as f:
            f.write("2\n0\n1,2\n3\n2,0\n")
        batches, _, _, _ = build_view_batches(
            ds, num_src=2, pairing="file", pair_file=pf)
        assert len(batches) == 2
        assert batches[0].images.shape[0] == 3
        # out-of-range views must be rejected loudly
        with open(pf, "w") as f:
            f.write("1\n0\n9,2\n")
        with pytest.raises(ValueError):
            build_view_batches(ds, num_src=2, pairing="file", pair_file=pf)

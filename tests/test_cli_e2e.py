"""End-to-end CLI smoke: PLY init -> train 3 steps -> eval.

Covers the public command surface (reference: run/gen_pnts.py,
run/train_ft.py, run/test_ft.py equivalents) on a tiny synthetic
blender scene.
"""

import json
import os

import numpy as np
import pytest

from pointnerf2studio_tpu.cli import main as cli_main

H = W = 16
FOCAL = 12.0


@pytest.fixture
def blender_dir(tmp_path):
    from PIL import Image
    root = tmp_path / "scene"
    root.mkdir()
    (root / "train").mkdir()
    frames = []
    for i, ang in enumerate((0.0, 0.4)):
        c2w = np.eye(4)
        # camera on a circle of radius 2 looking at the origin (blender
        # convention: -z forward, +y up; loader applies the flip)
        c, s = np.cos(ang), np.sin(ang)
        rot_y = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        c2w[:3, :3] = rot_y
        c2w[:3, 3] = rot_y @ np.array([0, 0, 2.0])
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = np.full((H, W, 4), 255, np.uint8)
        img[4:12, 4:12, :3] = 128
        Image.fromarray(img).save(root / "train" / f"r_{i}.png")
    meta = {"camera_angle_x": 2 * np.arctan(0.5 * W / FOCAL),
            "frames": frames}
    (root / "transforms_train.json").write_text(json.dumps(meta))
    return str(root)


@pytest.fixture
def ply_cloud(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = (v * 0.4).astype(np.float32)
    dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
    rec = np.zeros(500, dt)
    rec["x"], rec["y"], rec["z"] = pts.T
    p = tmp_path / "init.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 500\n")
        for a in "xyz":
            f.write(f"property float {a}\n".encode())
        f.write(b"end_header\n")
        f.write(rec.tobytes())
    return str(p)


def test_cli_gen_train_eval(blender_dir, ply_cloud, tmp_path, capsys):
    out = str(tmp_path / "run")
    # --comb-file appends ';'-delimited xyz rows to the PLY cloud
    # (reference --comb_file, nerf_synth360_ft_dataset.py:369-374)
    comb = tmp_path / "extra.txt"
    comb.write_text("0.05;0.05;0.05\n-0.05;-0.05;-0.05\n")
    cli_main(["gen-points", "--scene", "chair", "--data", blender_dir,
              "--from-ply", ply_cloud, "--comb-file", str(comb),
              "--out", out, "--capacity", "512"])
    assert os.path.exists(os.path.join(out, "0_net_ray_marching.pth"))
    from pointnerf2studio_tpu.utils.checkpoint_io import (
        load_torch_state_dict)
    sd = load_torch_state_dict(os.path.join(out, "0_net_ray_marching.pth"))
    xyz_key = [k for k in sd if k.endswith("xyz")][0]
    xyz = np.asarray(sd[xyz_key], np.float32).reshape(-1, 3)
    # voxel downsampling may merge a comb row into a nearby sphere
    # point, so assert the comb coordinates survive (within a voxel)
    # rather than an exact count
    assert xyz.shape[0] > 500
    for p in ((0.05, 0.05, 0.05), (-0.05, -0.05, -0.05)):
        d = np.linalg.norm(xyz - np.array(p, np.float32), axis=1).min()
        assert d < 0.05, (p, d)

    cli_main(["train", "--scene", "chair", "--data", blender_dir,
              "--point-cloud", out, "--out", out,
              "--max-steps", "3", "--rays-per-batch", "64",
              "--capacity", "512"])
    assert os.path.exists(os.path.join(out, "3_net_ray_marching.pth"))
    assert os.path.exists(os.path.join(out, "3_states.pth"))

    cli_main(["eval", "--scene", "chair", "--data", blender_dir,
              "--checkpoint", out, "--eval-views", "1"])
    printed = capsys.readouterr().out
    assert "psnr" in printed

    viz = str(tmp_path / "viz")
    cli_main(["visualize", "--checkpoint", out, "--out", viz])
    ply = os.path.join(viz, "points.ply")
    assert os.path.exists(ply)
    with open(ply, "rb") as f:
        head = f.read(200)
    assert b"element vertex" in head

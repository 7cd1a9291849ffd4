"""render_video writes a playable file; the frame-mode fast renderer
it uses matches the plain fast chunk loop on a video-path pose.

(The two GIFs themselves are not compared pixelwise: Pillow picks a
different 256-color palette per file, which dwarfs the 1-ulp render
difference.)
"""

import os

import numpy as np
import pytest

from pointnerf2studio_tpu.data.blender import pixel_raydirs
from pointnerf2studio_tpu.data.synthetic import make_sphere_scene, sphere_config
from pointnerf2studio_tpu.train.evaluator import (
    make_fast_chunk_fn, make_fast_frame_renderer, render_image,
    render_video, spherical_poses)


@pytest.fixture(scope="module")
def scene():
    import dataclasses
    cfg = sphere_config(sr=16, d=48)
    cfg = dataclasses.replace(
        cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=16))
    return make_sphere_scene(n_points=4000, cfg=cfg)


def test_render_video_writes_file(scene, tmp_path):
    s = scene
    h = w = 16
    intr = np.array([[12.0, 0, w / 2], [0, 12.0, h / 2], [0, 0, 1]],
                    np.float32)
    p = render_video(s.cfg, s.params, s.cloud, s.grid, intrinsics=intr,
                     hw=(h, w), near=s.near, far=s.far,
                     out_path=str(tmp_path / "orbit.gif"), n_frames=2,
                     radius=2.0, chunk=64, fps=4, fast=True)
    assert os.path.getsize(p) > 0
    import imageio
    f = np.stack(imageio.mimread(p))
    assert f.shape[0] == 2 and f.shape[1:3] == (h, w)


def test_video_frame_renderer_matches_chunk(scene):
    s = scene
    h = w = 16
    intr = np.array([[12.0, 0, w / 2], [0, 12.0, h / 2], [0, 0, 1]],
                    np.float32)
    i, j = np.meshgrid(np.arange(w), np.arange(h))
    xy = np.stack([i, j], -1).reshape(-1, 2)
    pose = spherical_poses(2, radius=2.0)[0]
    rays = pixel_raydirs(xy, intr, pose[:3, :3])

    fr = make_fast_frame_renderer(s.cfg, s.cloud, s.grid, s.near,
                                  s.far, chunk=64)
    o = fr(s.params, pose[:3, 3], pose[:3, :3], rays)
    img1 = np.asarray(o.coarse_raycolor).reshape(h, w, 3)

    ch = make_fast_chunk_fn(s.cfg, s.cloud, s.grid, s.near, s.far)
    out2 = render_image(ch, s.params, s.cloud, s.grid, pose[:3, 3],
                        pose[:3, :3], rays, (h, w), s.near, s.far, 64)
    assert int(np.asarray(o.ray_mask).sum()) > 10   # object visible
    np.testing.assert_array_equal(
        np.asarray(o.ray_mask).reshape(h, w), out2["ray_mask"])
    np.testing.assert_allclose(img1, out2["coarse_raycolor"],
                               rtol=0, atol=3e-7)


def test_interpolated_poses_match_endpoints():
    from pointnerf2studio_tpu.train.evaluator import (
        interpolated_poses, spherical_poses)
    base = spherical_poses(6, radius=4.0)
    out = interpolated_poses(base, n_views=30)   # 10 frames per pair
    assert out.shape == (60, 4, 4)
    # each segment starts exactly at its source camera
    for i in range(6):
        np.testing.assert_allclose(out[i * 10], base[i], atol=1e-5)
    # rotations stay orthonormal and the path is continuous
    for m in out:
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                   atol=1e-5)
    gaps = np.linalg.norm(np.diff(out[:, :3, 3], axis=0), axis=-1)
    assert gaps.max() < 1.0


def test_pfm_roundtrip(tmp_path):
    from pointnerf2studio_tpu.utils.pfm import read_pfm, write_pfm
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 5.0, size=(7, 5)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, depth)
    np.testing.assert_array_equal(read_pfm(p), depth)
    rgb = rng.uniform(size=(4, 6, 3)).astype(np.float32)
    write_pfm(p, rgb)
    np.testing.assert_array_equal(read_pfm(p), rgb)
    # big-endian + positive-scale variant (scale folds into values)
    with open(p, "wb") as f:
        f.write(b"Pf\n2 2\n2.0\n")
        f.write(np.array([[3, 4], [1, 2]], ">f4").tobytes())
    np.testing.assert_array_equal(
        read_pfm(p), np.array([[2, 4], [6, 8]], np.float32))


def test_grow_video_cli(tmp_path):
    """grow-video assembles evalimg_<step>/eval_NNN.png chronologically
    (reference run/vis_grow_train.py render_grow parity)."""
    import numpy as np
    from PIL import Image

    from pointnerf2studio_tpu.cli import main as cli_main

    run = tmp_path / "run"
    for i, step in enumerate([100, 200, 300]):
        d = run / f"evalimg_{step:06d}"
        d.mkdir(parents=True)
        img = np.full((8, 8, 3), i * 40, np.uint8)
        Image.fromarray(img).save(d / "eval_000.png")
    out = str(tmp_path / "grow.gif")
    cli_main(["grow-video", "--run", str(run), "--view", "0",
              "--out", out])
    import imageio
    frames = imageio.mimread(out)
    assert len(frames) == 3
    assert frames[0][..., 0].mean() < frames[2][..., 0].mean()

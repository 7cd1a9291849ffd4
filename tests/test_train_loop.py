"""End-to-end fit() integration test on a tiny self-consistent scene:
the dataset's images are renders of the scene itself from a 'teacher'
parameter set, so a freshly-initialized 'student' must make progress.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from pointnerf2studio_tpu.data.blender import BlenderDataset
from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
from pointnerf2studio_tpu.train.evaluator import (
    make_render_chunk_fn, render_image)
from pointnerf2studio_tpu.train.loop import fit
from pointnerf2studio_tpu.utils import checkpoint_io as cio


@pytest.fixture(scope="module")
def teacher_scene():
    return make_sphere_scene(n_points=2000, cfg=sphere_config(sr=8, d=32))


@pytest.fixture(scope="module")
def toy_dataset(teacher_scene):
    """One 16x16 view rendered by the teacher."""
    s = teacher_scene
    h = w = 16
    focal = 10.0
    rays = np.asarray(camera_rays(s.campos, s.camrotc2w, h, w, focal))
    fn = make_render_chunk_fn(s.cfg)
    out = render_image(fn, s.params, s.cloud, s.grid,
                       np.asarray(s.campos), np.asarray(s.camrotc2w),
                       rays, (h, w), s.near, s.far, chunk=128)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(s.camrotc2w)
    pose[:3, 3] = np.asarray(s.campos)
    intr = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                    np.float32)
    return BlenderDataset(
        images=out["coarse_raycolor"][None].astype(np.float32),
        poses=pose[None], intrinsics=intr,
        near=s.near, far=s.far, split="train")


def test_fit_hash_grid_matches_dense(teacher_scene, toy_dataset, tmp_path):
    """fit() with grid_mode='hash' (sparse bucket-table grid) produces
    the same training trajectory as the dense grid: the hash GeoCache
    rows and qslot numbering are identical, so with the same seed every
    step is bit-equal."""
    s = teacher_scene
    base = dataclasses.replace(
        s.cfg, train=dataclasses.replace(
            s.cfg.train, rays_per_batch=128, fast_path=True,
            prune_iter=0, prob_freq=0))
    student = init_aggregator_params(jax.random.PRNGKey(9), base.agg)
    student["density_head"][0]["bias"] = (
        student["density_head"][0]["bias"] + 5.0)

    results = {}
    for mode in ("dense", "hash"):
        cfg = dataclasses.replace(
            base, query=dataclasses.replace(base.query, grid_mode=mode))
        res = fit(cfg, toy_dataset, student, s.cloud,
                  str(tmp_path / mode), max_steps=8, print_freq=4,
                  save_freq=0, seed=3)
        results[mode] = res.state
    for a, b in zip(jax.tree.leaves(results["dense"].params),
                    jax.tree.leaves(results["hash"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(results["dense"].points.points_embeding),
        np.asarray(results["hash"].points.points_embeding))


def test_fit_hash_grid_rejects_legacy_and_growth(teacher_scene,
                                                 toy_dataset, tmp_path):
    s = teacher_scene
    cfg = dataclasses.replace(
        s.cfg,
        query=dataclasses.replace(s.cfg.query, grid_mode="hash"),
        train=dataclasses.replace(s.cfg.train, rays_per_batch=128,
                                  fast_path=False, prob_freq=0))
    with pytest.raises(ValueError, match="fast_path"):
        fit(cfg, toy_dataset, s.params, s.cloud, str(tmp_path / "x"),
            max_steps=1, save_freq=0)
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fast_path=True,
                                       prob_freq=5))
    with pytest.raises(ValueError, match="prob_freq"):
        fit(cfg2, toy_dataset, s.params, s.cloud, str(tmp_path / "y"),
            max_steps=1, save_freq=0)


def test_fit_reduces_loss_and_checkpoints(teacher_scene, toy_dataset, tmp_path):
    s = teacher_scene
    cfg = dataclasses.replace(
        s.cfg, train=dataclasses.replace(s.cfg.train, rays_per_batch=128,
                                         jitter=0.0))
    student = init_aggregator_params(jax.random.PRNGKey(7), cfg.agg)
    student["density_head"][0]["bias"] = (
        student["density_head"][0]["bias"] + 5.0)

    out_dir = str(tmp_path / "run")
    res = fit(cfg, toy_dataset, student, s.cloud, out_dir,
              max_steps=30, print_freq=10, save_freq=0,
              eval_dataset=toy_dataset, eval_views=[0], eval_chunk=128)

    # logs written
    log = open(os.path.join(out_dir, "log.txt")).read()
    assert "ray_masked_coarse_raycolor_loss" in log
    lines = [l for l in log.splitlines() if "total=" in l]
    first = float(lines[0].split("total=")[1].split()[0])
    last = float(lines[-1].split("total=")[1].split()[0])
    assert last < first, f"loss did not fall: {first} -> {last}"

    # final torch-format checkpoint readable
    ckpt = os.path.join(out_dir, "30_net_ray_marching.pth")
    assert os.path.exists(ckpt)
    params2, cloud2 = cio.load_reference_checkpoint(ckpt)
    assert cloud2 is not None and cloud2.capacity == 2000
    assert np.isfinite(res.metrics["psnr"])


def test_fit_save_cadence_hits_final_step(teacher_scene, toy_dataset,
                                          tmp_path):
    """max_steps on the save cadence: the end-of-run save must not
    re-write the cadence save's orbax step directory (regression:
    'Destination .../step_N already exists' crashed 20k-step runs with
    save_freq 10k at the finish line)."""
    s = teacher_scene
    cfg = dataclasses.replace(
        s.cfg, train=dataclasses.replace(s.cfg.train, rays_per_batch=64,
                                         jitter=0.0))
    student = init_aggregator_params(jax.random.PRNGKey(7), cfg.agg)
    out_dir = str(tmp_path / "run_cadence")
    fit(cfg, toy_dataset, student, s.cloud, out_dir,
        max_steps=4, print_freq=4, save_freq=2)
    assert cio.latest_step(os.path.join(out_dir, "ckpt")) == 4
    assert os.path.exists(os.path.join(out_dir,
                                       "4_net_ray_marching.pth"))


def test_fit_with_pruning(teacher_scene, toy_dataset, tmp_path):
    """Pruning kills low-confidence points mid-run without breaking."""
    s = teacher_scene
    # plant low confidence on a third of the points
    conf = np.asarray(s.cloud.points_conf).copy()
    conf[::3] = 0.01
    cloud = s.cloud.replace(points_conf=np.asarray(conf))
    cfg = dataclasses.replace(
        s.cfg, train=dataclasses.replace(
            s.cfg.train, rays_per_batch=128, jitter=0.0,
            prune_iter=5, prune_thresh=0.1, prune_max_iter=100))
    student = init_aggregator_params(jax.random.PRNGKey(7), cfg.agg)
    res = fit(cfg, toy_dataset, student, cloud, str(tmp_path / "run2"),
              max_steps=12, print_freq=5, save_freq=0)
    n_alive = int(np.asarray(res.state.points.num_alive))
    assert n_alive < 2000 and n_alive > 0
    assert np.isfinite(float(np.asarray(res.state.step)))


def test_alter_step_alternates_optimizers(teacher_scene, toy_dataset):
    """With alter_step=2: steps 1-2 (phase (step//2)%2) alternate which
    group moves; the skipped group's params AND Adam moments stay put
    (reference backward, neural_points_volumetric_model.py:204-211)."""
    import jax.numpy as jnp
    from pointnerf2studio_tpu.data.blender import PixelSampler
    from pointnerf2studio_tpu.train.trainer import (
        create_train_state, make_train_step)

    s = teacher_scene
    cfg = dataclasses.replace(
        s.cfg, train=dataclasses.replace(
            s.cfg.train, rays_per_batch=64, jitter=0.0, alter_step=1))
    step_fn = make_train_step(cfg)
    state = create_train_state(s.params, s.cloud, cfg)
    sampler = PixelSampler(toy_dataset, 64, seed=0)

    def l2diff(a, b):
        return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
            jax.tree.leaves(a), jax.tree.leaves(b)))

    for i in range(2):
        prev = state
        b = sampler.next_batch()
        state, _ = step_fn(
            state, s.grid, jnp.asarray(b["campos"]),
            jnp.asarray(b["camrotc2w"]), jnp.asarray(b["raydirs"]),
            jnp.asarray(b["gt_rgb"]), jnp.asarray(b["near"], jnp.float32),
            jnp.asarray(b["far"], jnp.float32), jax.random.PRNGKey(i))
        phase = int(np.asarray(prev.step)) % 2
        d_fields = l2diff(state.params, prev.params)
        d_points = l2diff(state.points.trainable(),
                          prev.points.trainable())
        if phase == 0:
            assert d_fields > 0 and d_points == 0, (d_fields, d_points)
        else:
            assert d_points > 0 and d_fields == 0, (d_fields, d_points)


def test_steps_per_dispatch_trajectory_exact(teacher_scene, toy_dataset,
                                             tmp_path):
    """K optimizer steps per dispatch (lax.scan) must be bit-identical
    to K single dispatches: the scan replays the same per-step PRNG
    split sequence. Also exercises the ragged tail (max_steps not a
    multiple of K) and stacked-aux logging."""
    s = teacher_scene

    def run(k, out):
        cfg = dataclasses.replace(
            s.cfg, train=dataclasses.replace(
                s.cfg.train, rays_per_batch=64, fast_path=True,
                prune_iter=0, prob_freq=0, steps_per_dispatch=k))
        student = init_aggregator_params(jax.random.PRNGKey(9), cfg.agg)
        return fit(cfg, toy_dataset, student, s.cloud,
                   str(tmp_path / out), max_steps=6, save_freq=0,
                   print_freq=3, seed=5)

    r1 = run(1, "k1")
    r4 = run(4, "k4")
    assert int(np.asarray(r4.state.step)) == 6
    np.testing.assert_array_equal(
        np.asarray(r4.state.points.points_embeding),
        np.asarray(r1.state.points.points_embeding))
    np.testing.assert_array_equal(
        np.asarray(r4.state.points.points_conf),
        np.asarray(r1.state.points.points_conf))
    for a, b in zip(jax.tree.leaves(r4.state.params),
                    jax.tree.leaves(r1.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_resumes_from_checkpoint(tmp_path):
    """fit() restores the latest orbax checkpoint and continues from
    the saved step (reference auto-resume, train_ft.py:542-546)."""
    import jax
    from pointnerf2studio_tpu.data.synthetic import (
        make_sphere_scene, sphere_config)
    from pointnerf2studio_tpu.data.blender import BlenderDataset
    from pointnerf2studio_tpu.train.loop import fit

    scene = make_sphere_scene(n_points=1500, cfg=sphere_config(sr=8, d=24))
    h = w = 8
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(scene.camrotc2w)
    pose[:3, 3] = np.asarray(scene.campos)
    ds = BlenderDataset(
        images=np.full((1, h, w, 3), 0.4, np.float32), poses=pose[None],
        intrinsics=np.array([[6.0, 0, w / 2], [0, 6.0, h / 2], [0, 0, 1]],
                            np.float32),
        near=scene.near, far=scene.far, split="train")
    import dataclasses
    cfg = dataclasses.replace(
        scene.cfg, train=dataclasses.replace(
            scene.cfg.train, rays_per_batch=32))
    out = str(tmp_path / "run")
    r1 = fit(cfg, ds, scene.params, scene.cloud, out, max_steps=2,
             save_freq=0, print_freq=100)
    assert int(np.asarray(r1.state.step)) == 2
    # second invocation resumes from the final (step 2) checkpoint
    r2 = fit(cfg, ds, scene.params, scene.cloud, out, max_steps=4,
             save_freq=0, print_freq=100)
    assert int(np.asarray(r2.state.step)) == 4
    # re-running a FINISHED run (max_steps == saved step) must restore
    # and return WITHOUT retraining (eval-after-train drivers re-call
    # fit); saves are idempotent if a crashed run re-hits a save step
    r3 = fit(cfg, ds, scene.params, scene.cloud, out, max_steps=4,
             save_freq=0, print_freq=100)
    assert int(np.asarray(r3.state.step)) == 4
    np.testing.assert_array_equal(
        np.asarray(r3.state.points.points_embeding),
        np.asarray(r2.state.points.points_embeding))
    from pointnerf2studio_tpu.utils import checkpoint_io as cio2
    cio2.save_train_state(os.path.join(out, "ckpt"), r3.state, 4)


def test_fit_march_auto_matches_dense(tmp_path):
    """fit() with TrainConfig.march_auto must produce a bit-identical
    loss trajectory to the dense lookup (selection is integer-only and
    the march tests the same jittered positions)."""
    import dataclasses

    import numpy as np

    from pointnerf2studio_tpu.data.procedural import (
        generate_chair_dataset)
    from pointnerf2studio_tpu.data.blender import load_blender
    from pointnerf2studio_tpu.data.synthetic import (
        make_sphere_scene, sphere_config)
    from pointnerf2studio_tpu.train.loop import fit

    cfg = sphere_config(sr=8, d=32)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, fast_path=True, rays_per_batch=256,
            device_sampling=True))
    scene = make_sphere_scene(n_points=2000, cfg=cfg)

    # tiny 2-view dataset of the sphere (enough for a march plan)
    from pointnerf2studio_tpu.train.evaluator import (
        make_render_chunk_fn, render_image)
    import jax.numpy as jnp
    h = w = 16
    focal = 12.0
    fn = make_render_chunk_fn(cfg)
    import numpy as np
    from pointnerf2studio_tpu.data.blender import BlenderDataset
    from pointnerf2studio_tpu.data.synthetic import camera_rays
    rays = np.asarray(camera_rays(scene.campos, scene.camrotc2w, h, w,
                                  focal))
    full = render_image(fn, scene.params, scene.cloud, scene.grid,
                        np.asarray(scene.campos),
                        np.asarray(scene.camrotc2w), rays, (h, w),
                        scene.near, scene.far, chunk=128)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(scene.camrotc2w)
    pose[:3, 3] = np.asarray(scene.campos)
    ds = BlenderDataset(
        images=np.stack([full["coarse_raycolor"]] * 2).astype(
            np.float32),
        poses=np.stack([pose, pose]),
        intrinsics=np.array([[focal, 0, w / 2], [0, focal, h / 2],
                             [0, 0, 1]], np.float32),
        near=scene.near, far=scene.far, split="train")

    def run(mcfg, out):
        res = fit(mcfg, ds, scene.params, scene.cloud, str(tmp_path / out),
                  max_steps=6, print_freq=3, save_freq=100,
                  resume=False)
        return res

    r0 = run(cfg, "dense")
    cfg_m = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, march_auto=True))
    r1 = run(cfg_m, "march")
    a = np.asarray(r0.state.points.points_embeding)
    b = np.asarray(r1.state.points.points_embeding)
    np.testing.assert_array_equal(a, b)

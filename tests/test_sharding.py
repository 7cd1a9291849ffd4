"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.render import render_rays_jit
from pointnerf2studio_tpu.parallel.sharding import (
    make_mesh, make_sharded_render, make_sharded_train_step)
from pointnerf2studio_tpu.train.trainer import create_train_state


@pytest.fixture(scope="module")
def scene():
    return make_sphere_scene(n_points=2_000, cfg=sphere_config(sr=8, d=32))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(scene):
    mesh = make_mesh(8)
    raydirs = camera_rays(scene.campos, scene.camrotc2w, 16, 16, 12.0)
    render8 = make_sharded_render(scene.cfg, mesh)
    out8 = render8(scene.params, scene.cloud, scene.grid, scene.campos,
                   scene.camrotc2w, raydirs,
                   jnp.asarray(scene.near), jnp.asarray(scene.far))
    out1 = render_rays_jit(scene.params, scene.cloud, scene.grid,
                           scene.campos, scene.camrotc2w, raydirs,
                           scene.near, scene.far, scene.cfg)
    np.testing.assert_allclose(
        np.asarray(out8.coarse_raycolor), np.asarray(out1.coarse_raycolor),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out8.ray_mask), np.asarray(out1.ray_mask))


def test_sharded_train_step_runs_and_learns(scene):
    mesh = make_mesh(8)
    step_fn = make_sharded_train_step(scene.cfg, mesh)
    state = create_train_state(scene.params, scene.cloud, scene.cfg)
    raydirs = camera_rays(scene.campos, scene.camrotc2w, 16, 16, 12.0)
    gt = jnp.ones((256, 3), jnp.float32) * 0.3
    losses = []
    for s in range(5):
        state, aux = step_fn(state, scene.grid, scene.campos,
                             scene.camrotc2w, raydirs, gt,
                             jnp.asarray(scene.near), jnp.asarray(scene.far),
                             jax.random.PRNGKey(s))
        losses.append(float(aux["total"]))
    assert int(state.step) == 5
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_graft_entry_compiles():
    import importlib.util, sys, pathlib
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_graft_dryrun_multichip():
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

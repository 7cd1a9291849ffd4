"""Distance-field ray-march front-end (ops/march.py) vs the dense
fast path: identical outputs while mc_overflow == 0, counters trip on
insufficient fuel/buckets."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene)
from pointnerf2studio_tpu.ops.march import build_march_table


def _with_march(cfg, steps, buckets):
    return dataclasses.replace(
        cfg, query=dataclasses.replace(
            cfg.query, march_steps=tuple(steps),
            march_buckets=tuple(buckets)))


@pytest.fixture(scope="module")
def scene():
    cfg = sphere_config(sr=16, d=48)
    cfg = dataclasses.replace(
        cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=16,
                                       compact_budget=6))
    return make_sphere_scene(n_points=4000, cfg=cfg)


def test_march_table_distances():
    occ = np.zeros((8, 9, 10), np.int32) - 1
    occ[2, 3, 4] = 7
    occ[6, 1, 1] = 11
    table = np.asarray(build_march_table(jnp.asarray(occ)))
    qs = (table >> 5) - 1
    c = table & 31
    np.testing.assert_array_equal(qs[occ >= 0], occ[occ >= 0])
    assert (qs[occ < 0] == -1).all()
    pts = np.argwhere(occ >= 0)
    for v in np.ndindex(occ.shape):
        want = min(int(np.abs(pts - np.asarray(v)).max(-1).min()), 31)
        assert c[v] == want, (v, c[v], want)


def test_march_matches_dense_path(scene):
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    ref = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)

    cfg_m = _with_march(s.cfg, steps=(16, 24, 80), buckets=(256, 128))
    cache_m, _, _ = make_fast_scene(cfg_m, s.cloud, s.grid)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache_m, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_m, rmin, svs)

    assert int(out.mc_overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(ref.coarse_raycolor))
    np.testing.assert_array_equal(np.asarray(out.acc),
                                  np.asarray(ref.acc))
    np.testing.assert_array_equal(np.asarray(out.depth),
                                  np.asarray(ref.depth))


def test_march_composes_with_ray_budget(scene):
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    ref = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)

    cfg_m = _with_march(s.cfg, steps=(16, 24, 80), buckets=(256, 128))
    cfg_m = dataclasses.replace(
        cfg_m, query=dataclasses.replace(cfg_m.query, ray_budget=512))
    cache_m, _, _ = make_fast_scene(cfg_m, s.cloud, s.grid)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache_m, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_m, rmin, svs)

    assert int(out.mc_overflow) == 0
    assert int(out.rb_overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(ref.coarse_raycolor))


def test_plan_march_yields_exact_config(scene):
    s = scene
    import numpy as _np

    from pointnerf2studio_tpu.ops.march import plan_march
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    occ = jnp.asarray(s.grid.coor_occ)
    tbl = _np.asarray(build_march_table(
        jnp.where(occ.astype(bool), 0, -1)))
    q = s.cfg.query
    cap = min(q.SR, q.ray_slot_budget or min(q.SR, 32), q.z_depth_dim)
    steps, buckets = plan_march(
        tbl, s.grid.ranges_min, q.scaled_vsize, s.campos,
        _np.asarray(rays), float(s.near), float(s.far),
        q.z_depth_dim, cap)
    assert len(buckets) == len(steps) - 1

    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    ref = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    cfg_m = _with_march(s.cfg, steps=steps, buckets=buckets)
    cache_m, _, _ = make_fast_scene(cfg_m, s.cloud, s.grid)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache_m, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_m, rmin, svs)
    assert int(out.mc_overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(ref.coarse_raycolor))


def test_march_overflow_counters_trip(scene):
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    # starve the fuel: one 2-step stage cannot cover a 48-sample span
    cfg_m = _with_march(s.cfg, steps=(2,), buckets=())
    cache_m, rmin, svs = make_fast_scene(cfg_m, s.cloud, s.grid)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache_m, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_m, rmin, svs)
    assert int(out.mc_overflow) > 0

    # starve the stage-1 bucket: active rays past 8 are dropped and
    # stay unfinished
    cfg_b = _with_march(s.cfg, steps=(1, 80), buckets=(8,))
    cache_b, _, _ = make_fast_scene(cfg_b, s.cloud, s.grid)
    out_b = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache_b, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_b, rmin, svs)
    assert int(out_b.mc_overflow) > 0


def test_march_live_mask(scene):
    """march_rays(live=mask): dead rows (the rb packing's padding
    duplicates) never march — they emit nothing, consume no fuel, and
    are excluded from mc_overflow (the r4 bench's chunk-dependent
    overflow trips came from dup rows walking past planned budgets)."""
    from pointnerf2studio_tpu.data.synthetic import camera_rays
    from pointnerf2studio_tpu.ops.march import march_rays

    s = scene
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    from pointnerf2studio_tpu.ops.march import build_march_table
    tbl = build_march_table(cache.coor_2_qslot)
    dims = cache.coor_2_qslot.shape
    D = s.cfg.query.z_depth_dim
    rays = camera_rays(s.campos, s.camrotc2w, 16, 16, 12.0)
    # a packed-style array: real rays then dups of a HITTING ray (the
    # center ray walks several steps; corner rays miss the sphere and
    # would be done at start, masking the effect under test)
    packed = jnp.concatenate(
        [rays, jnp.broadcast_to(rays[16 * 8 + 8], (64, 3))])
    live = jnp.concatenate([jnp.ones((rays.shape[0],), bool),
                            jnp.zeros((64,), bool)])
    step_t = (s.far - s.near) / D

    def run(**kw):
        return march_rays(
            tbl.reshape(-1), jnp.asarray(dims, jnp.int32), dims[1],
            dims[2], rmin, svs, s.campos, packed,
            jnp.asarray(s.near), jnp.asarray(s.far),
            jnp.asarray(step_t), D, 16, (2 * D,), (), **kw)

    emit_all, cnt_all, _ = run()
    emit_lv, cnt_lv, mc = run(live=live)
    assert int(mc) == 0
    np.testing.assert_array_equal(np.asarray(cnt_lv[:256]),
                                  np.asarray(cnt_all[:256]))
    np.testing.assert_array_equal(np.asarray(emit_lv[:256]),
                                  np.asarray(emit_all[:256]))
    assert int(jnp.sum(cnt_lv[256:])) == 0
    # fuel sized at 1 step: unfinished counts exclude dead rows
    _, _, mc1 = run(live=live)
    _, _, mc1b = march_rays(
        tbl.reshape(-1), jnp.asarray(dims, jnp.int32), dims[1],
        dims[2], rmin, svs, s.campos, packed,
        jnp.asarray(s.near), jnp.asarray(s.far),
        jnp.asarray(step_t), D, 16, (1,), (), live=live)
    _, _, mc1c = march_rays(
        tbl.reshape(-1), jnp.asarray(dims, jnp.int32), dims[1],
        dims[2], rmin, svs, s.campos, packed,
        jnp.asarray(s.near), jnp.asarray(s.far),
        jnp.asarray(step_t), D, 16, (1,), ())
    # with the dup ray needing > 1 step, live masking removes exactly
    # the 64 dead copies from the unfinished count
    assert int(mc1c) - int(mc1b) == 64

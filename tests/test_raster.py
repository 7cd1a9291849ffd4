"""Raster front-end (ops/raster.py) parity vs the march front-end.

The sort-based frame binning must reproduce the march's per-ray
first-cap ascending-d emit EXACTLY (same packed values), and the
render outputs through `premarch` must be bit-identical to the
march-walked ones. Reference behavior anchored by the same tests that
anchor the march (tests/test_fast_render.py::test_march_*)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import make_chair_scene
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene)
from pointnerf2studio_tpu.ops.march import build_march_table, plan_march
from pointnerf2studio_tpu.ops.raster import (
    build_qvox, camera_rays_device, make_raster_program)

H = W = 64
FOCAL = 220.0     # wide enough that the smoke chair covers pixel space


def _scene_and_cfg():
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.016,) * 3, vscale=(2, 2, 2), SR=24, K=8, P=12,
            max_o=200_000, z_depth_dim=64, compact_budget=4,
            ray_slot_budget=16, use_cache=False, fast_chunk=512),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    scene = make_chair_scene(n_points=30_000, cfg=cfg)
    rays = camera_rays_device(scene.camrotc2w, H, W, FOCAL)
    tbl = np.asarray(jax.device_get(build_march_table(
        jnp.where(jnp.asarray(scene.grid.coor_occ).astype(bool), 0, -1))))
    q = cfg.query
    cap = min(q.SR, q.ray_slot_budget, q.z_depth_dim)
    steps, buckets = plan_march(
        tbl, scene.grid.ranges_min, q.scaled_vsize, scene.campos,
        np.asarray(jax.device_get(rays)), float(scene.near),
        float(scene.far), q.z_depth_dim, cap, slack=1.5,
        chunk=H * W, fuel_margin=10)
    cfg = dataclasses.replace(cfg, query=dataclasses.replace(
        q, march_steps=steps, march_buckets=buckets))
    cache, rmin, svs = make_fast_scene(
        cfg, scene.cloud, scene.grid, near=scene.near, far=scene.far,
        params=scene.params)
    return scene, cfg, cache, rmin, svs, rays, cap


@pytest.fixture(scope="module")
def setup():
    return _scene_and_cfg()


def _emit(setup, classes=((3, 3, 3), (6, 6, 5), (12, 12, 10)),
          budgets=(0, 16384, 4096)):
    scene, cfg, cache, rmin, svs, rays, cap = setup
    q = cfg.query
    step_t = (scene.far - scene.near) / q.z_depth_dim
    qvox = build_qvox(cache.coor_2_qslot, cache.rows.shape[0])
    prog = make_raster_program(
        H, W, FOCAL, q.z_depth_dim, cap, classes=classes,
        class_budgets=budgets, live_budget=1 << 20)
    emit, counters = prog(
        qvox, rmin, svs, scene.campos, scene.camrotc2w, rays,
        jnp.asarray(scene.near, jnp.float32),
        jnp.asarray(step_t, jnp.float32), jnp.float32(0.0))
    return emit, counters


def test_counters_zero(setup):
    _, counters = _emit(setup)
    names = ["class_overflow", "list_overflow", "live_overflow",
             "certain_flip"]
    vals = {n: int(v) for n, v in zip(names, np.asarray(counters))}
    assert all(v == 0 for v in vals.values()), vals


def test_emit_matches_march(setup):
    scene, cfg, cache, rmin, svs, rays, cap = setup
    from pointnerf2studio_tpu.ops.march import march_rays
    q = cfg.query
    dims = cache.coor_2_qslot.shape
    step_t = (scene.far - scene.near) / q.z_depth_dim
    m_emit, m_cnt, m_of = march_rays(
        cache.march_table.reshape(-1), jnp.array(dims, jnp.int32),
        dims[1], dims[2], rmin, svs, scene.campos, rays,
        jnp.asarray(scene.near, jnp.float32),
        jnp.asarray(scene.far, jnp.float32),
        jnp.asarray(step_t, jnp.float32), q.z_depth_dim, cap,
        q.march_steps, q.march_buckets)
    assert int(m_of) == 0
    r_emit, counters = _emit(setup)
    assert int(np.asarray(counters).sum()) == 0
    m_cnt = np.asarray(m_cnt)
    r_cnt = np.asarray((r_emit != 0).sum(-1))
    np.testing.assert_array_equal(m_cnt, r_cnt)
    me = np.asarray(m_emit)
    re = np.asarray(r_emit)
    lanes = np.arange(cap)[None, :] < m_cnt[:, None]
    np.testing.assert_array_equal(me[lanes], re[lanes])


def test_render_frame_raster_parity(setup, capsys):
    """render_frame(raster=...) == render_frame walk, bit-for-bit —
    with dataset-style pinhole intrinsics (fx != fy, off-center
    principal point) and pixel_raydirs' +1e-5-norm rays (the band
    phase must absorb the ~1e-5 relative direction shift)."""
    scene, cfg, cache, rmin, svs, rays_unused, cap = setup
    from pointnerf2studio_tpu.data.blender import pixel_raydirs
    from pointnerf2studio_tpu.models.fast_render import render_frame
    K = np.array([[210.0, 0.0, 30.0],
                  [0.0, 222.0, 34.5],
                  [0.0, 0.0, 1.0]], np.float32)
    i, j = np.meshgrid(np.arange(W), np.arange(H))
    xy = np.stack([i, j], -1).reshape(-1, 2)
    rays = jnp.asarray(pixel_raydirs(
        xy, K, np.asarray(scene.camrotc2w)))
    kw = dict(chunk=1024, tier_quant=1_000_000)
    outs = []
    for raster in (None, (H, W, (210.0, 222.0, 30.0, 34.5))):
        outs.append(render_frame(
            scene.params, scene.cloud.Rw2c, cache, scene.campos,
            scene.camrotc2w, rays, scene.near, scene.far, cfg,
            rmin, svs, raster=raster, verbose=True, **kw))
    err = capsys.readouterr().err
    assert "raster disabled" not in err and "walking" not in err, err
    for f in ("coarse_raycolor", "ray_mask", "acc", "depth"):
        np.testing.assert_array_equal(
            np.asarray(getattr(outs[0], f)),
            np.asarray(getattr(outs[1], f)), err_msg=f)


def test_two_phase_parity(setup):
    """decode_chunk2 (two-phase chunk pipeline) vs single-phase.

    Same math, but a different decode batch shape retiles the tower
    GEMMs, so f32 accumulation order (and the bf16 rounds derived
    from it) can differ in the LAST ULP on isolated elements
    (measured: 2 of 12288 color components at ~2.8e-4 = one bf16
    step). decode_chunk2 therefore powers the quality-measured
    approximate tier, NOT the bitwise-exact official config; this
    test pins the contract: identical masks, colors within one bf16
    ulp on a vanishing fraction of elements."""
    scene, cfg, cache, rmin, svs, rays, cap = setup
    cfg2 = dataclasses.replace(cfg, query=dataclasses.replace(
        cfg.query, decode_chunk2=8192))
    out1 = fast_render_rays_jit(
        scene.params, scene.cloud.Rw2c, cache, scene.campos,
        scene.camrotc2w, rays, scene.near, scene.far, cfg, rmin, svs)
    out2 = fast_render_rays_jit(
        scene.params, scene.cloud.Rw2c, cache, scene.campos,
        scene.camrotc2w, rays, scene.near, scene.far, cfg2, rmin, svs)
    np.testing.assert_array_equal(np.asarray(out1.ray_mask),
                                  np.asarray(out2.ray_mask))
    a = np.asarray(out1.coarse_raycolor)
    b = np.asarray(out2.coarse_raycolor)
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=0)
    assert (a != b).mean() < 1e-3, (a != b).mean()


@pytest.mark.parametrize("rb", [0, 3072])
def test_render_parity(setup, rb):
    scene, cfg, cache, rmin, svs, rays, cap = setup
    if rb:
        cfg = dataclasses.replace(cfg, query=dataclasses.replace(
            cfg.query, ray_budget=rb))
    out_m = fast_render_rays_jit(
        scene.params, scene.cloud.Rw2c, cache, scene.campos,
        scene.camrotc2w, rays, scene.near, scene.far, cfg, rmin, svs)
    emit, counters = _emit(setup)
    assert int(np.asarray(counters).sum()) == 0
    out_r = fast_render_rays_jit(
        scene.params, scene.cloud.Rw2c, cache, scene.campos,
        scene.camrotc2w, rays, scene.near, scene.far, cfg, rmin, svs,
        premarch=emit)
    np.testing.assert_array_equal(np.asarray(out_m.coarse_raycolor),
                                  np.asarray(out_r.coarse_raycolor))
    np.testing.assert_array_equal(np.asarray(out_m.ray_mask),
                                  np.asarray(out_r.ray_mask))
    np.testing.assert_array_equal(np.asarray(out_m.acc),
                                  np.asarray(out_r.acc))
    np.testing.assert_array_equal(np.asarray(out_m.depth),
                                  np.asarray(out_r.depth))

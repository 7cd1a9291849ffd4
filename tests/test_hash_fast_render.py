"""Hash-backed fat cache through the fast render path: bit-equal to
the dense cache where both fit, exact under ray packing, and able to
render a scene whose logical voxel dims (~1000^3+) put the dense
qslot table far beyond HBM. Reference anchor: same render semantics
as studio_model.get_outputs (pointnerf/nerfstudio/studio_model.py:
263-399); sparse-grid rationale in ops/hash_grid.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models import neural_points as npts
from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene, make_hash_fast_scene)
from pointnerf2studio_tpu.ops.grid import build_grid_from_points
from pointnerf2studio_tpu.ops.hash_grid import build_hash_grid_from_points


@pytest.fixture(scope="module")
def scene():
    cfg = sphere_config(sr=16, d=48)
    cfg = dataclasses.replace(
        cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=16))
    return make_sphere_scene(n_points=4000, cfg=cfg)


def _render(s, cache, rmin, svs, cfg, rays):
    return fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg, rmin, svs)


def test_hash_cache_matches_dense(scene):
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    dcache, drmin, dsvs = make_fast_scene(s.cfg, s.cloud, s.grid)
    hg = build_hash_grid_from_points(s.cloud.xyz, s.cloud.alive,
                                     s.cfg.query)
    hcache, hrmin, hsvs = make_hash_fast_scene(s.cfg, s.cloud, hg)

    np.testing.assert_allclose(np.asarray(hrmin), np.asarray(drmin))
    # identical qslot numbering -> identical candidate rows
    nq = int(hg.n_q)
    np.testing.assert_array_equal(
        np.asarray(hcache.rows[:nq]), np.asarray(dcache.rows[:nq]))

    ref = _render(s, dcache, drmin, dsvs, s.cfg, rays)
    out = _render(s, hcache, hrmin, hsvs, s.cfg, rays)
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(ref.coarse_raycolor))
    np.testing.assert_array_equal(np.asarray(out.acc),
                                  np.asarray(ref.acc))
    np.testing.assert_array_equal(np.asarray(out.depth),
                                  np.asarray(ref.depth))


def test_hash_ray_budget_exact(scene):
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 10.0)  # wide FOV
    hg = build_hash_grid_from_points(s.cloud.xyz, s.cloud.alive,
                                     s.cfg.query)
    hcache, rmin, svs = make_hash_fast_scene(s.cfg, s.cloud, hg)
    base = _render(s, hcache, rmin, svs, s.cfg, rays)

    from pointnerf2studio_tpu.models.fast_render import slab_hit_mask
    hits = int(slab_hit_mask(
        s.campos, rays, s.near, s.far, s.cfg.query.z_depth_dim,
        rmin, np.asarray(hg.dims), svs).sum())
    assert 0 < hits < rays.shape[0]
    cfg_rb = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, ray_budget=(hits + 15) // 16 * 16))
    out = _render(s, hcache, rmin, svs, cfg_rb, rays)
    assert int(out.rb_overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(base.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(base.coarse_raycolor))


def test_hash_geo_cache_train_matches_dense(scene):
    """Hash-backed GeoCache through the differentiable TRAIN path:
    bit-equal forward and matching gradients vs the dense geometry
    cache (same jitter key -> same draws; qslot numbering identical)."""
    from pointnerf2studio_tpu.models.fast_train import (
        fast_train_render, make_geo_scene, make_hash_geo_scene)
    from pointnerf2studio_tpu.train.loss import compute_losses
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 16, 16, 12.0)
    key = jax.random.PRNGKey(11)
    dgeo, drmin, dsvs = make_geo_scene(s.cfg, s.cloud, s.grid)
    hg = build_hash_grid_from_points(s.cloud.xyz, s.cloud.alive,
                                     s.cfg.query)
    hgeo, hrmin, hsvs = make_hash_geo_scene(s.cfg, s.cloud, hg)
    nq = int(hg.n_q)
    np.testing.assert_array_equal(np.asarray(hgeo.rows[:nq]),
                                  np.asarray(dgeo.rows[:nq]))

    ref = fast_train_render(s.params, s.cloud, dgeo, s.campos,
                            s.camrotc2w, rays, s.near, s.far, s.cfg,
                            drmin, dsvs, key=key, training=True)
    out = fast_train_render(s.params, s.cloud, hgeo, s.campos,
                            s.camrotc2w, rays, s.near, s.far, s.cfg,
                            hrmin, hsvs, key=key, training=True)
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(ref.coarse_raycolor))

    gt = jnp.asarray(
        np.random.default_rng(4).random((rays.shape[0], 3)), jnp.float32)

    def loss(pt, geo, rmin, svs):
        points = s.cloud.with_trainable(pt)
        o = fast_train_render(s.params, points, geo, s.campos,
                              s.camrotc2w, rays, s.near, s.far, s.cfg,
                              rmin, svs, key=key, training=True)
        return compute_losses(o, gt, s.cfg.train)[0]

    g_d = jax.grad(loss)(s.cloud.trainable(), dgeo, drmin, dsvs)
    g_h = jax.grad(loss)(s.cloud.trainable(), hgeo, hrmin, hsvs)
    for k in g_d:
        np.testing.assert_allclose(np.asarray(g_h[k]),
                                   np.asarray(g_d[k]),
                                   rtol=1e-6, atol=1e-9)


def test_huge_extent_render():
    """Two point clusters 41 units apart on the diagonal: logical dims
    ~1000^3 (a dense int32 qslot table would be ~5 GB). The hash cache
    renders the visible cluster BIT-EQUAL to a dense build that only
    ever sees that cluster — same ranges_min (the far cluster extends
    only the max corner), same (x, y, z)-order qslots for the near
    cluster (the far cluster sorts after it)."""
    rng = np.random.default_rng(7)
    n1 = 3000
    pts1 = rng.standard_normal((n1, 3)).astype(np.float32)
    pts1 /= np.linalg.norm(pts1, axis=-1, keepdims=True)
    pts1 *= 0.5
    pts2 = pts1 + np.float32(41.0)
    colors = (pts1 + 0.5).clip(0, 1)
    dirs = pts1 / np.linalg.norm(pts1, axis=-1, keepdims=True)
    emb = rng.standard_normal((n1, 32)).astype(np.float32) * 0.1
    conf = np.full((n1, 1), 0.8, np.float32)

    cfg = sphere_config(sr=16, d=48)
    cfg = dataclasses.replace(
        cfg, query=dataclasses.replace(
            cfg.query, ray_slot_budget=16, cand_cap=16,
            ranges=(-50.0,) * 3 + (50.0,) * 3))

    cloud1 = npts.from_arrays(pts1, emb, conf, dirs, colors)
    cloudJ = npts.from_arrays(
        np.concatenate([pts1, pts2]), np.concatenate([emb, emb]),
        np.concatenate([conf, conf]), np.concatenate([dirs, dirs]),
        np.concatenate([colors, colors]))

    grid1 = build_grid_from_points(cloud1.xyz, cloud1.alive, cfg.query)
    hg = build_hash_grid_from_points(cloudJ.xyz, cloudJ.alive,
                                     cfg.query)
    dims = np.asarray(hg.dims)
    assert np.all(dims > 1000), dims       # beyond any dense table
    assert int(hg.overflow) == 0

    params = init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
    params["density_head"][0]["bias"] = (
        params["density_head"][0]["bias"] + 5.0)

    class S:
        pass

    s = S()
    s.params = params
    s.cloud = cloud1
    s.campos = jnp.array([0.0, 0.0, 2.0])
    s.camrotc2w = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    s.near, s.far = 1.0, 3.0

    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    dcache, drmin, dsvs = make_fast_scene(cfg, cloud1, grid1)
    ref = _render(s, dcache, drmin, dsvs, cfg, rays)

    sJ = S()
    sJ.__dict__.update(s.__dict__)
    sJ.cloud = cloudJ
    hcache, hrmin, hsvs = make_hash_fast_scene(cfg, cloudJ, hg)
    np.testing.assert_allclose(np.asarray(hrmin), np.asarray(drmin))
    out = _render(sJ, hcache, hrmin, hsvs, cfg, rays)

    assert np.asarray(ref.ray_mask).sum() > 0
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(ref.coarse_raycolor))
    np.testing.assert_array_equal(np.asarray(out.depth),
                                  np.asarray(ref.depth))


def test_fit_cand_cap_guard():
    """HBM feasibility fence: ScanNet-scale query-voxel counts degrade
    cand_cap instead of RESOURCE_EXHAUSTing the chip (VERDICT r3 #4),
    and truly infeasible sizes raise an actionable error."""
    import pytest

    from pointnerf2studio_tpu.models.fast_render import fit_cand_cap

    # fits: untouched
    assert fit_cand_cap(100_000, 64,
                        budget_bytes=4 << 30) == 64
    # 3M voxels x 64 x 92 B ~ 17 GiB: degrades to fit ~9.6 GiB
    cc = fit_cand_cap(3_000_000, 64, budget_bytes=int(9.6 * 2 ** 30))
    assert cc < 64 and 3_000_000 * cc * 23 * 4 <= 9.6 * 2 ** 30
    # infeasible even at 8: actionable error pointing at the sharded path
    with pytest.raises(ValueError, match="points' mesh axis"):
        fit_cand_cap(50_000_000, 64, budget_bytes=4 << 30)

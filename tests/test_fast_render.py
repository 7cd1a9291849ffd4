"""Fast render path (fat cache + one-hot compaction) vs the reference
render path: identical masks, colors within bf16-attribute rounding.

With ray_slot_budget >= SR the fast path's selection semantics match
the legacy path exactly; the only numeric difference is the bf16
packing of point attributes in the cache rows.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene, onehot_select_qd)
from pointnerf2studio_tpu.models.render import render_rays_jit


@pytest.fixture(scope="module")
def scene():
    cfg = sphere_config(sr=16, d=48)
    cfg = dataclasses.replace(
        cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=16))
    return make_sphere_scene(n_points=4000, cfg=cfg)


def _rays(s, h=24, w=24, focal=18.0):
    return camera_rays(s.campos, s.camrotc2w, h, w, focal)


def test_fast_matches_reference_path(scene):
    s = scene
    rays = _rays(s)
    ref = render_rays_jit(s.params, s.cloud, s.grid, s.campos,
                         s.camrotc2w, rays, s.near, s.far, s.cfg)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)

    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(ref.ray_mask))
    both = np.asarray(ref.ray_mask)
    diff = np.abs(np.asarray(out.coarse_raycolor)
                  - np.asarray(ref.coarse_raycolor))[both]
    assert diff.max() < 0.05, diff.max()
    assert diff.mean() < 0.005, diff.mean()
    # background rays exactly bg
    missed = ~both
    if missed.any():
        np.testing.assert_array_equal(
            np.asarray(out.coarse_raycolor)[missed], 1.0)


def test_onehot_select_qd_exact_large_ids():
    """The one-hot slot compaction must be EXACT for qslot ids up to
    ~2^20 on every backend — on TPU the matmul truncates operands to
    bf16, so the implementation extracts bf16-exact base-128 digits.
    (This test runs wherever the suite runs; bench.py exercises the
    same code on the real chip.)"""
    rng = np.random.default_rng(3)
    R, D, BP = 64, 96, 16
    mask = rng.random((R, D)) < 0.25
    qs = np.where(mask,
                  rng.integers(0, 2 ** 20, (R, D), dtype=np.int64),
                  -1).astype(np.int32)
    d_true = np.broadcast_to(np.arange(D, dtype=np.int32) * 11, (R, D))
    rank = np.cumsum(mask, -1)
    keep = mask & (rank <= BP)
    q_sel, d_sel = jax.jit(onehot_select_qd, static_argnums=4)(
        jnp.asarray(keep), jnp.asarray(rank), jnp.asarray(qs),
        jnp.asarray(d_true), BP)
    for r in range(R):
        sel_d = np.nonzero(keep[r])[0]
        n = len(sel_d)
        np.testing.assert_array_equal(np.asarray(q_sel)[r, :n],
                                      qs[r, sel_d])
        np.testing.assert_array_equal(np.asarray(d_sel)[r, :n],
                                      d_true[r, sel_d])


def test_fast_coarse_masking_matches(scene):
    """Two-level sample masking (coarse_step) is exact: the coarse test
    is conservative and the fine pass re-checks every sample."""
    s = scene
    cfg2 = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, coarse_step=5, coarse_win_budget=12,
            coarse_win_global=8))
    rays = _rays(s)
    cache0, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache0, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    cache2, rmin2, svs2 = make_fast_scene(
        cfg2, s.cloud, s.grid, near=s.near, far=s.far)
    assert cache2.coarse_occ is not None
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache2, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg2, rmin2, svs2)
    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(base.ray_mask))
    np.testing.assert_allclose(
        np.asarray(out.coarse_raycolor),
        np.asarray(base.coarse_raycolor), atol=1e-5)


def test_depth_window_matches(scene):
    """Per-ray depth-window clip (slab test vs the grid box) is exact
    whenever dw_overflow == 0; a too-short window reports overflow."""
    from pointnerf2studio_tpu.models.fast_render import (
        suggest_depth_window)
    s = scene
    rays = _rays(s)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    dw = suggest_depth_window(s.grid.dims, s.cfg.query.scaled_vsize,
                              s.near, s.far, s.cfg.query.z_depth_dim)
    cfg2 = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, depth_window=dw))
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg2, rmin, svs)
    assert int(out.dw_overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(base.ray_mask))
    np.testing.assert_allclose(
        np.asarray(out.coarse_raycolor),
        np.asarray(base.coarse_raycolor), atol=1e-5)
    # a clearly-too-short window must surface nonzero overflow
    cfg3 = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, depth_window=8))
    out3 = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg3, rmin, svs)
    assert int(out3.dw_overflow) > 0


def test_coarse_with_depth_window_matches(scene):
    """coarse_step composed with depth_window (per-ray windowed coarse
    domain) must match the plain fast path exactly while both counters
    are zero."""
    from pointnerf2studio_tpu.models.fast_render import (
        suggest_depth_window)
    s = scene
    rays = _rays(s)
    base_cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, base_cache, s.campos, s.camrotc2w,
        rays, s.near, s.far, s.cfg, rmin, svs)
    dw = suggest_depth_window(s.grid.dims, s.cfg.query.scaled_vsize,
                              s.near, s.far, s.cfg.query.z_depth_dim)
    # force a window strictly inside D so the composition is exercised
    dw = min(dw, s.cfg.query.z_depth_dim - 4)
    cfg2 = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, coarse_step=4, coarse_win_budget=12,
            depth_window=dw))
    cache2, _, _ = make_fast_scene(cfg2, s.cloud, s.grid,
                                   near=s.near, far=s.far)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache2, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg2, rmin, svs)
    assert int(out.win_overflow) == 0, int(out.win_overflow)
    assert int(out.dw_overflow) == 0, int(out.dw_overflow)
    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(base.ray_mask))
    np.testing.assert_allclose(
        np.asarray(out.coarse_raycolor),
        np.asarray(base.coarse_raycolor), atol=1e-5)


def test_ray_budget_matches(scene):
    """Ray packing (slab-test hit rays only) is exact whenever
    rb_overflow == 0: packed rays reproduce the full render, missed
    rays get exact background. A too-small budget reports overflow."""
    from pointnerf2studio_tpu.models.fast_render import slab_hit_mask
    s = scene
    rays = _rays(s)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    hits = slab_hit_mask(s.campos, rays, s.near, s.far,
                         s.cfg.query.z_depth_dim, rmin,
                         s.grid.dims, svs)
    assert 0 < hits.sum() < rays.shape[0], (
        "test scene must have both hit and miss rays")
    rb = int(hits.sum()) + 8
    cfg2 = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, ray_budget=rb))
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg2, rmin, svs)
    assert int(out.rb_overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(base.ray_mask))
    np.testing.assert_allclose(
        np.asarray(out.coarse_raycolor),
        np.asarray(base.coarse_raycolor), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.depth), np.asarray(base.depth), atol=1e-4)
    # composes with the depth window (bench.py's default config)
    from pointnerf2studio_tpu.models.fast_render import (
        suggest_depth_window)
    dw = suggest_depth_window(s.grid.dims, s.cfg.query.scaled_vsize,
                              s.near, s.far, s.cfg.query.z_depth_dim)
    cfg3 = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, ray_budget=rb, depth_window=dw))
    out3 = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg3, rmin, svs)
    assert int(out3.rb_overflow) == 0 and int(out3.dw_overflow) == 0
    np.testing.assert_allclose(
        np.asarray(out3.coarse_raycolor),
        np.asarray(base.coarse_raycolor), atol=1e-5)
    # a clearly-too-small budget must surface nonzero overflow
    cfg4 = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, ray_budget=8))
    out4 = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg4, rmin, svs)
    assert int(out4.rb_overflow) > 0


def test_topk_compaction_matches_onehot(scene):
    """compact_mode='topk' must select EXACTLY the same shading slots
    as the one-hot design (first min(SR, BP) valid samples per ray)."""
    s = scene
    rays = _rays(s)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    cfg_tk = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query,
                                         compact_mode="topk"))
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_tk, rmin, svs)
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(base.ray_mask))
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(base.coarse_raycolor),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc),
                               np.asarray(base.acc), atol=1e-5)


def test_krows_extract_matches_onehot(scene):
    """extract_mode='krows' (slim selection gather + direct K-row
    payload gather) must be BIT-identical to the one-hot extract: same
    selection keys (same bf16 rel offsets), same payload bits."""
    s = scene
    rays = _rays(s)
    cfg_oh = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, compact_mode="topk", composite_mode="packed"))
    cfg_kr = dataclasses.replace(
        cfg_oh, query=dataclasses.replace(cfg_oh.query,
                                          extract_mode="krows"))
    cache, rmin, svs = make_fast_scene(cfg_kr, s.cloud, s.grid)
    assert cache.slim is not None
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_oh, rmin, svs)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_kr, rmin, svs)
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(base.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(base.coarse_raycolor))
    np.testing.assert_array_equal(np.asarray(out.acc),
                                  np.asarray(base.acc))


def test_krows_with_base_cache_matches(scene):
    """krows + base_cache: the sel_meta path must feed the same
    per-point base_h rows as the take_along_axis path."""
    s = scene
    rays = _rays(s)
    cfg_bh = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, compact_mode="topk", composite_mode="packed",
            base_cache=True))
    cfg_kr = dataclasses.replace(
        cfg_bh, query=dataclasses.replace(cfg_bh.query,
                                          extract_mode="krows"))
    cache, rmin, svs = make_fast_scene(cfg_kr, s.cloud, s.grid,
                                       params=s.params)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_bh, rmin, svs)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_kr, rmin, svs)
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(base.ray_mask))
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor),
                                  np.asarray(base.coarse_raycolor))


def test_packed_composite_matches_grid(scene):
    """composite_mode='packed' (segmented scans on the [M] compacted
    axis, no scatter-back) must reproduce the grid composite: same
    masks, colors/acc/depth equal up to f32 reduction-tree changes."""
    s = scene
    rays = _rays(s)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    for extra in ({}, {"coarse_step": 5, "coarse_win_budget": 12,
                       "coarse_win_global": 8}):
        cfg_g = dataclasses.replace(
            s.cfg, query=dataclasses.replace(
                s.cfg.query, compact_mode="topk", **extra))
        cfg_p = dataclasses.replace(
            cfg_g, query=dataclasses.replace(
                cfg_g.query, composite_mode="packed"))
        if extra:
            cache_v, rmin_v, svs_v = make_fast_scene(
                cfg_g, s.cloud, s.grid, near=s.near, far=s.far)
        else:
            cache_v, rmin_v, svs_v = cache, rmin, svs
        base = fast_render_rays_jit(
            s.params, s.cloud.Rw2c, cache_v, s.campos, s.camrotc2w,
            rays, s.near, s.far, cfg_g, rmin_v, svs_v)
        out = fast_render_rays_jit(
            s.params, s.cloud.Rw2c, cache_v, s.campos, s.camrotc2w,
            rays, s.near, s.far, cfg_p, rmin_v, svs_v)
        np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                      np.asarray(base.ray_mask))
        np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                                   np.asarray(base.coarse_raycolor),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.acc),
                                   np.asarray(base.acc), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth),
                                   np.asarray(base.depth), atol=1e-4)


def test_coarse_overflow_reported(scene):
    """Starving the window budgets must be VISIBLE: win_overflow
    counts the true positive windows the layout caps dropped."""
    s = scene
    rays = _rays(s)
    cfg_tight = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, coarse_step=5, coarse_win_budget=1,
            coarse_win_global=1))
    cache, rmin, svs = make_fast_scene(cfg_tight, s.cloud, s.grid,
                                       near=s.near, far=s.far)
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_tight, rmin, svs)
    assert out.win_overflow is not None
    assert int(out.win_overflow) > 0

    # generous budgets: no overflow, exact output
    cfg_ok = dataclasses.replace(
        s.cfg, query=dataclasses.replace(
            s.cfg.query, coarse_step=5, coarse_win_budget=12,
            coarse_win_global=8))
    cache2, rmin2, svs2 = make_fast_scene(cfg_ok, s.cloud, s.grid,
                                          near=s.near, far=s.far)
    out2 = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache2, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_ok, rmin2, svs2)
    assert int(out2.win_overflow) == 0


def test_fast_sharded_matches_single(scene):
    from pointnerf2studio_tpu.parallel.sharding import (
        make_mesh, make_sharded_fast_render)
    s = scene
    rays = _rays(s, 16, 16)    # 256 rays / 8 devices
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    single = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    mesh = make_mesh(8)
    f = make_sharded_fast_render(s.cfg, mesh)
    shard = f(s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
              jnp.asarray(s.near), jnp.asarray(s.far), rmin, svs)
    np.testing.assert_allclose(
        np.asarray(shard.coarse_raycolor),
        np.asarray(single.coarse_raycolor), atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(shard.ray_mask), np.asarray(single.ray_mask))


def test_render_frame_sharded_matches_single(scene):
    """render_frame driven by the shard_map renderer (the bench's
    configuration) matches the single-device frame render on the
    8-device virtual mesh."""
    from pointnerf2studio_tpu.models.fast_render import render_frame
    from pointnerf2studio_tpu.parallel.sharding import (
        make_mesh, make_sharded_fast_render)

    s = scene
    rays = _rays(s, 16, 16)    # 256 rays; chunk 64 / 8 devices
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    near_j, far_j = jnp.asarray(s.near), jnp.asarray(s.far)
    mesh = make_mesh(8)

    def render_maker(c):
        render = make_sharded_fast_render(c, mesh)

        def fn(rays_c, bg):
            return render(s.params, s.cloud.Rw2c, cache, s.campos,
                          s.camrotc2w, rays_c, near_j, far_j, rmin, svs)

        return fn

    single = render_frame(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs, chunk=64, tier_quant=8)
    shard = render_frame(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs, chunk=64, tier_quant=8,
        render_maker=render_maker)
    np.testing.assert_array_equal(np.asarray(shard.ray_mask),
                                  np.asarray(single.ray_mask))
    np.testing.assert_allclose(np.asarray(shard.coarse_raycolor),
                               np.asarray(single.coarse_raycolor),
                               atol=2e-2)


def test_render_frame_matches_unpacked(scene):
    """Frame-level ray packing + span-tiered depth windows must be
    bit-identical to the plain fast path on the raw ray order —
    including a ragged tail (Rtot not a chunk multiple), padded
    duplicate rays, per-ray plane-background colors, and miss rays."""
    from pointnerf2studio_tpu.models.fast_render import render_frame

    s = scene
    rays = _rays(s, h=25, w=24)     # 600 rays: ragged vs chunk=256
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    bg = jnp.asarray(
        np.random.default_rng(0).random((600, 3)), jnp.float32)

    ref = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs, bg_ray_colors=bg)
    hit_frac = float(np.asarray(ref.ray_mask).mean())
    assert 0.05 < hit_frac < 0.95   # both hits and misses exercised

    progs = {}
    out = render_frame(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs, chunk=128, render_maker=None,
        bg_ray_colors=bg, program_cache=progs, tier_quant=8)

    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    # different static chunk shapes let XLA reassociate the weighted
    # sums -> 1-ulp wiggle on hit rays (on-chip dw chaincheck is
    # bit-exact at matched shapes); miss rays must be exactly bg
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(ref.coarse_raycolor),
                               rtol=0, atol=3e-7)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=0, atol=3e-7)
    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(ref.depth), rtol=0, atol=1e-5)
    miss = ~np.asarray(ref.ray_mask)
    np.testing.assert_array_equal(
        np.asarray(out.coarse_raycolor)[miss], np.asarray(bg)[miss])
    if out.dw_overflow is not None:
        assert int(out.dw_overflow) == 0
    # span-sorted tiers: at least one chunk compiled below full D
    assert any(dw > 0 for dw, _, _ in progs), list(progs)


def test_cb_overflow_counter(scene):
    """The compact-budget (M cap) exactness counter: 0 at an ample
    budget, positive when the budget is too small for the batch's
    valid-sample total."""
    s = scene
    rays = _rays(s)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)

    def run(budget):
        cfg = dataclasses.replace(s.cfg, query=dataclasses.replace(
            s.cfg.query, compact_budget=budget))
        return fast_render_rays_jit(
            s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w,
            rays, s.near, s.far, cfg, rmin, svs)

    ample = run(12)
    assert ample.cb_overflow is not None
    assert int(ample.cb_overflow) == 0
    tight = run(1)
    assert int(tight.cb_overflow) > 0
    # at the per-ray column cap the M budget cannot overflow
    assert run(16).cb_overflow is None


def test_render_frame_budget_tier_exact(scene):
    """A low starting compaction budget must escalate (cb_overflow
    retry) and still produce the plain fast path's outputs."""
    from pointnerf2studio_tpu.models.fast_render import render_frame

    s = scene
    rays = _rays(s, h=25, w=24)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    ref = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)

    progs = {}
    out = render_frame(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs, chunk=128,
        program_cache=progs, tier_quant=8, budget_tier=1)

    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(ref.coarse_raycolor),
                               rtol=0, atol=3e-7)
    if out.cb_overflow is not None:
        assert int(out.cb_overflow) == 0
    budgets = {b for _, _, b in progs}
    assert 1 in budgets and max(budgets) > 1, budgets


def test_render_frame_all_miss(scene):
    """A frame whose rays all miss the box is pure background with no
    rendered chunks."""
    from pointnerf2studio_tpu.models.fast_render import render_frame

    s = scene
    rays = -_rays(s, h=8, w=8)      # camera looks away
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    out = render_frame(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs, chunk=32)
    assert not bool(np.asarray(out.ray_mask).any())
    np.testing.assert_array_equal(np.asarray(out.coarse_raycolor), 1.0)


@pytest.mark.parametrize("ablate", [
    "qslot", "compact", "selonly", "scatterback", "gather", "knn",
    "extract", "weights", "decode",
    "p_gather", "p_geom", "p_knn", "p_extract", "p_dists"])
def test_debug_ablate_paths_run(scene, ablate):
    """Every perf-probe ablation key must EXECUTE (wrong values, real
    timing) under the shipped probe configs — an ablate branch that
    leaves a local unset crashes a 6-minute on-chip probe setup (the
    compact-skip UnboundLocalError on cb_overflow did exactly that).
    Covers both the packed composite (shipped) and the grid composite
    ("scatterback"'s real home)."""
    from pointnerf2studio_tpu.models.fast_render import fast_render_rays

    s = scene
    rays = _rays(s, h=8, w=8)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    R, D = rays.shape[0], s.cfg.query.z_depth_dim
    for comp in ("packed", "grid"):
        cfg = dataclasses.replace(s.cfg, query=dataclasses.replace(
            s.cfg.query, compact_mode="topk", composite_mode=comp,
            depth_window=max(D - 8, 1), ray_budget=R))
        out = fast_render_rays(
            s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w,
            rays, s.near, s.far, cfg, rmin, svs, debug_ablate=ablate)
        assert out.coarse_raycolor.shape == (R, 3)
        assert np.isfinite(np.asarray(out.coarse_raycolor)).all()


def test_base_cache_matches(scene):
    """QueryConfig.base_cache (per-point mlp_base layer-1 partial
    product, models/aggregator.precompute_base_h): identical masks,
    colors within the cached partial sum's bf16 rounding."""
    s = scene
    rays = _rays(s)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    cfg_bh = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, base_cache=True))
    cache_bh, _, _ = make_fast_scene(cfg_bh, s.cloud, s.grid,
                                     params=s.params)
    assert cache_bh.base_h is not None
    assert cache_bh.base_h.shape[0] == s.cloud.xyz.shape[0]
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache_bh, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_bh, rmin, svs)
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(base.ray_mask))
    both = np.asarray(base.ray_mask)
    diff = np.abs(np.asarray(out.coarse_raycolor)
                  - np.asarray(base.coarse_raycolor))[both]
    assert diff.max() < 5e-3, diff.max()
    assert diff.mean() < 5e-4, diff.mean()


def test_base_cache_requires_params(scene):
    s = scene
    cfg_bh = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, base_cache=True))
    with pytest.raises(ValueError, match="params"):
        make_fast_scene(cfg_bh, s.cloud, s.grid)


def test_cand_prune_bit_exact(scene):
    """QueryConfig.cand_prune: the pruned-width cache renders BIT-
    identically to the unpruned one (ops/query.candidate_keep_mask's
    exactness argument), and the stored width actually shrinks."""
    s = scene
    rays = _rays(s)
    cache0, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache0, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)
    cfgp = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, cand_prune=True))
    cache1, rmin1, svs1 = make_fast_scene(cfgp, s.cloud, s.grid)
    assert cache1.cand <= cache0.cand
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache1, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfgp, rmin1, svs1)
    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(base.ray_mask))
    np.testing.assert_array_equal(
        np.asarray(out.coarse_raycolor),
        np.asarray(base.coarse_raycolor))
    np.testing.assert_array_equal(
        np.asarray(out.acc), np.asarray(base.acc))

"""Span-tiered ray packing (QueryConfig.span_tiers) exactness.

The tiered path must be bit-identical to the plain fast path: tier
assignment only changes WHICH static window each ray's front-end
gather uses, and every tier window provably covers its rays' in-box
spans (the same slab math sizes both). Mirrors the dw/rb exactness
tests; reference behavior anchor: the single CUDA query pass of
pointnerf/models/neural_points/cuda/query_worldcoords.cu:305-433
processes every ray at full depth — the tiers are a pure TPU-side
row-count optimization.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene)
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene, measured_span_tiers)


@pytest.fixture(scope="module")
def scene_and_rays():
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.02, 0.02, 0.02), vscale=(2, 2, 2), SR=24, K=8,
            P=12, max_o=200_000, z_depth_dim=120, compact_budget=6,
            ray_slot_budget=16, use_cache=False, fast_chunk=2048),
        agg=AggregatorConfig(compute_dtype="float32"),
    )
    scene = make_sphere_scene(n_points=20_000, cfg=cfg)
    cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid,
                                       near=scene.near, far=scene.far)
    raydirs = camera_rays(scene.campos, scene.camrotc2w, 48, 48, 40.0)
    return cfg, scene, cache, rmin, svs, raydirs


def _render(cfg, scene, cache, rmin, svs, raydirs):
    return fast_render_rays_jit(
        scene.params, scene.cloud.Rw2c, cache, scene.campos,
        scene.camrotc2w, raydirs, jnp.asarray(scene.near),
        jnp.asarray(scene.far), cfg, rmin, svs)


def test_span_tiers_bit_exact(scene_and_rays):
    cfg, scene, cache, rmin, svs, raydirs = scene_and_rays
    # compact_budget 0 = full per-ray slot cap: no M truncation in
    # either path, so tiering must be bit-exact. (With a finite budget
    # the PLAIN path pools M across the batch while tiers pool per
    # tier — both exact only while cb_overflow == 0, tested below.)
    cfg = dataclasses.replace(cfg, query=dataclasses.replace(
        cfg.query, compact_budget=0))
    base = _render(cfg, scene, cache, rmin, svs, raydirs)

    widths, budgets = measured_span_tiers(
        scene.campos, np.asarray(raydirs), scene.near, scene.far,
        cfg.query.z_depth_dim, scene.grid.ranges_min, scene.grid.dims,
        cfg.query.scaled_vsize, round_to=64)
    assert len(widths) == len(budgets) >= 2
    cfg_t = dataclasses.replace(cfg, query=dataclasses.replace(
        cfg.query, span_tiers=widths, span_tier_budgets=budgets))
    out = _render(cfg_t, scene, cache, rmin, svs, raydirs)

    assert int(out.rb_overflow) == 0
    assert int(out.dw_overflow) == 0
    assert out.cb_overflow is None or int(out.cb_overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(base.ray_mask))
    # identical selection; colors to float epsilon only — XLA:CPU GEMM
    # blocking varies with batch shape, so the per-tier decode GEMMs
    # reduce in a different order (~2e-7). On the TPU MXU rows are
    # shape-independent; chip-level bit-exactness is verified by
    # tools/check_variant_exact.py tkpcstm.
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(base.coarse_raycolor),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc),
                               np.asarray(base.acc), atol=1e-5)
    # tiers actually split the rays (not everything in one tier)
    span_rows = sum(w * b for w, b in zip(widths, budgets))
    assert span_rows < widths[-1] * sum(budgets)


def test_span_tiers_cb_counter_guards_inexactness(scene_and_rays):
    """With a finite compact budget the tiered path must either match
    the plain path exactly or report the truncation via cb_overflow —
    a tripped counter is the signal bench.py uses to degrade."""
    cfg, scene, cache, rmin, svs, raydirs = scene_and_rays
    base = _render(cfg, scene, cache, rmin, svs, raydirs)
    widths, budgets = measured_span_tiers(
        scene.campos, np.asarray(raydirs), scene.near, scene.far,
        cfg.query.z_depth_dim, scene.grid.ranges_min, scene.grid.dims,
        cfg.query.scaled_vsize, round_to=64)
    cfg_t = dataclasses.replace(cfg, query=dataclasses.replace(
        cfg.query, span_tiers=widths, span_tier_budgets=budgets))
    out = _render(cfg_t, scene, cache, rmin, svs, raydirs)
    masks_equal = bool(np.array_equal(np.asarray(out.ray_mask),
                                      np.asarray(base.ray_mask)))
    cb = 0 if out.cb_overflow is None else int(out.cb_overflow)
    assert masks_equal or cb > 0


def test_span_tier_budget_overflow_counts(scene_and_rays):
    cfg, scene, cache, rmin, svs, raydirs = scene_and_rays
    widths, budgets = measured_span_tiers(
        scene.campos, np.asarray(raydirs), scene.near, scene.far,
        cfg.query.z_depth_dim, scene.grid.ranges_min, scene.grid.dims,
        cfg.query.scaled_vsize, round_to=64)
    # starve the LAST tier (the widest) — dropped hit rays must count
    starved = budgets[:-1] + (max(budgets[-1] // 8, 1),)
    cfg_t = dataclasses.replace(cfg, query=dataclasses.replace(
        cfg.query, span_tiers=widths, span_tier_budgets=starved))
    out = _render(cfg_t, scene, cache, rmin, svs, raydirs)
    assert int(out.rb_overflow) > 0


def test_span_tiers_last_width_short_trips_dw(scene_and_rays):
    cfg, scene, cache, rmin, svs, raydirs = scene_and_rays
    widths, budgets = measured_span_tiers(
        scene.campos, np.asarray(raydirs), scene.near, scene.far,
        cfg.query.z_depth_dim, scene.grid.ranges_min, scene.grid.dims,
        cfg.query.scaled_vsize, round_to=64)
    # a too-short last width: long-span rays land in the last tier and
    # its sub-render's depth window drops their tail samples
    short = tuple(min(w, max(widths[-1] // 3, 2)) for w in widths)
    short = tuple(sorted(set(short)))
    cfg_t = dataclasses.replace(cfg, query=dataclasses.replace(
        cfg.query, span_tiers=short,
        span_tier_budgets=budgets[: len(short)]))
    out = _render(cfg_t, scene, cache, rmin, svs, raydirs)
    assert int(out.dw_overflow) > 0

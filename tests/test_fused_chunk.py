"""chunk_mode='fused' (single-Pallas-pass chunk pipeline) vs the
staged XLA path, in interpret mode on CPU.

Selection is pure f32 with the same op order, so masks must match
EXACTLY; sigma/rgb go through split matmuls with a different bf16/f32
rounding ORDER (ops/fused_chunk.py docstring), so colors match to
bf16-rounding tolerance, not bit-for-bit. The TPU timing is a bench
concern (tools/probe_bench_variants.py 'tkfc*')."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene)


def _bf16(cfg):
    return dataclasses.replace(
        cfg, agg=dataclasses.replace(cfg.agg, compute_dtype="bfloat16"))


@pytest.fixture(scope="module")
def scene():
    cfg = _bf16(sphere_config(sr=16, d=48))
    cfg = dataclasses.replace(
        cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=16))
    return make_sphere_scene(n_points=4000, cfg=cfg)


def _render(scene_, cfg, cache, rmin, svs, rays):
    return fast_render_rays_jit(
        scene_.params, scene_.cloud.Rw2c, cache, scene_.campos,
        scene_.camrotc2w, rays, scene_.near, scene_.far, cfg, rmin, svs)


def test_fused_chunk_matches_xla(scene):
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = _render(s, s.cfg, cache, rmin, svs, rays)

    cfg_f = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, chunk_mode="fused"))
    cache_f, _, _ = make_fast_scene(cfg_f, s.cloud, s.grid)
    assert cache_f.kmeta is not None and cache_f.kpay is not None
    out = _render(s, cfg_f, cache_f, rmin, svs, rays)

    # identical selection -> identical masks; found-any drives ray_mask
    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(base.ray_mask))
    # the MLP tower re-associates bf16 matmuls: tolerance, not bits
    np.testing.assert_allclose(
        np.asarray(out.coarse_raycolor),
        np.asarray(base.coarse_raycolor), rtol=0, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out.acc), np.asarray(base.acc), rtol=0, atol=2e-2)
    # the bulk of pixels should agree much tighter than the worst case
    diff = np.abs(np.asarray(out.coarse_raycolor, np.float32)
                  - np.asarray(base.coarse_raycolor, np.float32))
    assert np.mean(diff) < 2e-3


def test_fused_chunk_ineligible_configs_fall_back(scene):
    """Configs outside the kernel's flagship shape render through the
    XLA path (bit-identical to chunk_mode='xla') instead of failing."""
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 12, 12, 9.0)
    agg_q = dataclasses.replace(
        s.cfg.agg, agg_distance_kernel="quadric")
    for agg in (agg_q,
                dataclasses.replace(s.cfg.agg, compute_dtype="float32")):
        cfg_f = dataclasses.replace(
            s.cfg,
            agg=agg,
            query=dataclasses.replace(s.cfg.query, chunk_mode="fused"))
        cache_f, rmin, svs = make_fast_scene(cfg_f, s.cloud, s.grid)
        cfg_x = dataclasses.replace(cfg_f, query=dataclasses.replace(
            cfg_f.query, chunk_mode="xla", knn_mode="fused"))
        out_f = _render(s, cfg_f, cache_f, rmin, svs, rays)
        out_x = _render(s, cfg_x, cache_f, rmin, svs, rays)
        np.testing.assert_array_equal(
            np.asarray(out_f.coarse_raycolor),
            np.asarray(out_x.coarse_raycolor))


def test_fused_chunk_eligibility_gates():
    from pointnerf2studio_tpu.ops.fused_chunk import fused_chunk_eligible
    ok = AggregatorConfig(compute_dtype="bfloat16")
    assert fused_chunk_eligible(ok, per_point_rw2c=False, K=8)
    assert not fused_chunk_eligible(ok, per_point_rw2c=True, K=8)
    assert not fused_chunk_eligible(
        dataclasses.replace(ok, agg_intrp_order=1), False, 8)
    assert not fused_chunk_eligible(
        dataclasses.replace(ok, compute_dtype="float32"), False, 8)

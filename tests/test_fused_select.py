"""knn_mode='fused' (single-pass Pallas candidate selection) must
reproduce the XLA-stage fast path exactly — same selection, same
bf16 payload values — in interpret mode on CPU (the TPU timing is a
bench concern, tools/probe_bench_variants.py 'tkfs')."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene)


@pytest.fixture(scope="module")
def scene():
    cfg = sphere_config(sr=16, d=48)
    cfg = dataclasses.replace(
        cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=16))
    return make_sphere_scene(n_points=4000, cfg=cfg)


def test_fused_select_matches_xla(scene):
    s = scene
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
    base = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, s.cfg, rmin, svs)

    cfg_f = dataclasses.replace(
        s.cfg, query=dataclasses.replace(s.cfg.query, knn_mode="fused"))
    cache_f, _, _ = make_fast_scene(cfg_f, s.cloud, s.grid)
    assert cache_f.kmeta is not None and cache_f.kpay is not None
    out = fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache_f, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg_f, rmin, svs)

    np.testing.assert_array_equal(
        np.asarray(out.ray_mask), np.asarray(base.ray_mask))
    np.testing.assert_allclose(
        np.asarray(out.coarse_raycolor),
        np.asarray(base.coarse_raycolor), rtol=0, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out.acc), np.asarray(base.acc), rtol=0, atol=2e-6)


def test_pack_kernel_cache_roundtrip(scene):
    """The kernel-facing layout carries exactly the rows' meta +
    payload bits."""
    from pointnerf2studio_tpu.models.fast_render import PAYW, ROWW
    from pointnerf2studio_tpu.ops.fused_select import pack_kernel_cache

    s = scene
    cache, _, _ = make_fast_scene(s.cfg, s.cloud, s.grid)
    kmeta, kpay = jax.jit(pack_kernel_cache)(cache.rows)
    C = cache.cand
    r3 = np.asarray(cache.rows).reshape(-1, C, ROWW)
    meta_ref = r3[..., 0].view(np.int32)
    pay_ref = r3[..., 1:].copy().view(np.uint16).reshape(-1, C, PAYW)
    np.testing.assert_array_equal(np.asarray(kmeta), meta_ref)
    kp = np.asarray(kpay).view(np.uint16)
    np.testing.assert_array_equal(
        np.transpose(kp, (0, 2, 1))[:, :, :PAYW], pay_ref)


def test_direct_fused_layout_matches_packed_rows(scene):
    """layout='fused' (built without ever materializing rows — the
    rows+kpay double residency OOMed v5e at chair scale) must emit
    bit-identical kmeta/kpay to pack_kernel_cache(rows)."""
    import dataclasses as dc

    from pointnerf2studio_tpu.ops.fused_select import pack_kernel_cache

    s = scene
    cache, _, _ = make_fast_scene(s.cfg, s.cloud, s.grid)
    kmeta_ref, kpay_ref = jax.jit(pack_kernel_cache)(cache.rows)

    cfg_f = dc.replace(
        s.cfg, query=dc.replace(s.cfg.query, knn_mode="fused"))
    cache_f, _, _ = make_fast_scene(cfg_f, s.cloud, s.grid)
    assert cache_f.rows.shape[0] == 1          # placeholder only
    assert cache_f.cand == cache.cand
    np.testing.assert_array_equal(
        np.asarray(cache_f.kmeta), np.asarray(kmeta_ref))
    np.testing.assert_array_equal(
        np.asarray(cache_f.kpay).view(np.uint16),
        np.asarray(kpay_ref).view(np.uint16))

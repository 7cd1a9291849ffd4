"""Fused Pallas decode kernel vs the XLA decoder (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.models.aggregator import (
    decode_radiance, init_aggregator_params)
from pointnerf2studio_tpu.ops.encoding import positional_encoding
from pointnerf2studio_tpu.ops.fused_decode import (
    fused_decode, fused_decode_eligible)

RNG = np.random.default_rng(7)
M, K, C = 70, 8, 32   # M deliberately NOT a multiple of the tile size


def make_inputs():
    emb = RNG.normal(size=(M, K, C)).astype(np.float32) * 0.1
    color = RNG.random((M, K, 3)).astype(np.float32)
    ndir = RNG.normal(size=(M, K, 3)).astype(np.float32)
    ndir /= np.linalg.norm(ndir, axis=-1, keepdims=True)
    dists = RNG.normal(size=(M, K, 6)).astype(np.float32) * 0.01
    pm = RNG.random((M, K)) > 0.3
    pm[:, 0] = True
    w = RNG.random((M, K)).astype(np.float32) * pm
    w /= np.maximum(w.sum(-1, keepdims=True), 1e-8)
    vd = RNG.normal(size=(M, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    return emb, color, ndir, dists, pm, w, vd


def test_fused_matches_xla_decoder():
    cfg = AggregatorConfig(compute_dtype="bfloat16")
    assert fused_decode_eligible(cfg, per_point_rw2c=False, K=K)
    params = init_aggregator_params(jax.random.PRNGKey(0), cfg)
    emb, color, ndir, dists, pm, w, vd = make_inputs()
    rw2c = jnp.eye(3)

    sigma_ref, rgb_ref = decode_radiance(
        params, cfg, jnp.asarray(emb), jnp.asarray(color),
        jnp.asarray(ndir), jnp.asarray(dists), jnp.asarray(w),
        jnp.asarray(pm), jnp.asarray(vd), rw2c)

    # kernel-side precomputation (what render_rays does before the call)
    dir_enc = positional_encoding(jnp.asarray(vd), cfg.num_viewdir_freqs,
                                  ori=True)
    ov, dir_pe = dir_enc[..., :3], dir_enc[..., 3:]
    dirdot = jnp.concatenate(
        [jnp.asarray(ndir) - ov[:, None, :],
         jnp.sum(jnp.asarray(ndir) * ov[:, None, :], -1, keepdims=True)], -1)
    wk = jnp.asarray(w * pm)

    sigma, rgb = fused_decode(
        params, jnp.asarray(emb), jnp.asarray(dists), jnp.asarray(color),
        dirdot, wk, dir_pe, K=K,
        num_feat_freqs=cfg.num_feat_freqs,
        num_dist_freqs=cfg.num_dist_freqs, interpret=True)

    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               rtol=3e-2, atol=2e-2)


def test_fused2_matches_xla_decoder():
    """K-accumulating variant (fused_decode2): same math, K-reduction
    inside the kernel via resident-block accumulation."""
    from pointnerf2studio_tpu.ops.fused_decode import fused_decode2

    cfg = AggregatorConfig(compute_dtype="bfloat16")
    params = init_aggregator_params(jax.random.PRNGKey(0), cfg)
    emb, color, ndir, dists, pm, w, vd = make_inputs()
    rw2c = jnp.eye(3)

    sigma_ref, rgb_ref = decode_radiance(
        params, cfg, jnp.asarray(emb), jnp.asarray(color),
        jnp.asarray(ndir), jnp.asarray(dists), jnp.asarray(w),
        jnp.asarray(pm), jnp.asarray(vd), rw2c)

    dir_enc = positional_encoding(jnp.asarray(vd), cfg.num_viewdir_freqs,
                                  ori=True)
    ov, dir_pe = dir_enc[..., :3], dir_enc[..., 3:]
    dirdot = jnp.concatenate(
        [jnp.asarray(ndir) - ov[:, None, :],
         jnp.sum(jnp.asarray(ndir) * ov[:, None, :], -1, keepdims=True)], -1)
    wk = jnp.asarray(w * pm)

    sigma, rgb = fused_decode2(
        params, jnp.asarray(emb), jnp.asarray(dists), jnp.asarray(color),
        dirdot, wk, dir_pe, K=K,
        num_feat_freqs=cfg.num_feat_freqs,
        num_dist_freqs=cfg.num_dist_freqs, interpret=True)

    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               rtol=3e-2, atol=2e-2)


def test_eligibility_gates():
    cfg = AggregatorConfig()
    assert not fused_decode_eligible(
        dataclasses.replace(cfg, num_mlp_base_layers=3), False, 8)
    assert not fused_decode_eligible(
        dataclasses.replace(cfg, point_color_mode=False), False, 8)
    assert not fused_decode_eligible(
        dataclasses.replace(cfg, agg_distance_kernel="sh_intrp"), False, 8)
    assert not fused_decode_eligible(cfg, True, 8)

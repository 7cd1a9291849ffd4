"""agg_intrp_order 0/1/2 decoder variants
(reference: point_aggregators.py:531-660)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.models.aggregator import (
    _mlp_dims, decode_radiance, init_aggregator_params)

RNG = np.random.default_rng(5)
M, K, C = 12, 8, 32


def make_inputs():
    emb = jnp.asarray(RNG.normal(size=(M, K, C)).astype(np.float32) * 0.1)
    color = jnp.asarray(RNG.random((M, K, 3)).astype(np.float32))
    ndir = RNG.normal(size=(M, K, 3)).astype(np.float32)
    ndir /= np.linalg.norm(ndir, axis=-1, keepdims=True)
    dists = jnp.asarray(RNG.normal(size=(M, K, 6)).astype(np.float32) * 0.01)
    pm = jnp.asarray(RNG.random((M, K)) > 0.3)
    w = RNG.random((M, K)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    vd = RNG.normal(size=(M, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    return emb, color, jnp.asarray(ndir), dists, pm, jnp.asarray(w), \
        jnp.asarray(vd)


def run(cfg):
    params = init_aggregator_params(jax.random.PRNGKey(1), cfg)
    emb, color, ndir, dists, pm, w, vd = make_inputs()
    return decode_radiance(params, cfg, emb, color, ndir, dists, w, pm,
                           vd, jnp.eye(3))


class TestOrders:
    def test_order2_default(self):
        sigma, rgb = run(AggregatorConfig())
        assert sigma.shape == (M,) and rgb.shape == (M, 3)
        assert np.all(np.asarray(sigma) >= 0)

    def test_order1(self):
        sigma, rgb = run(AggregatorConfig(agg_intrp_order=1))
        assert sigma.shape == (M,) and rgb.shape == (M, 3)
        assert np.all(np.isfinite(np.asarray(rgb)))

    def test_order0(self):
        cfg = AggregatorConfig(agg_intrp_order=0, point_color_mode=False,
                               point_dir_mode=False)
        sigma, rgb = run(cfg)
        assert sigma.shape == (M,) and rgb.shape == (M, 3)
        # base tower input excludes dist features
        dims = _mlp_dims(cfg)
        assert dims["mlp_base"][0][0] == 32 + 2 * cfg.num_feat_freqs * 32

    def test_order0_rejects_color_mode(self):
        with pytest.raises(ValueError):
            run(AggregatorConfig(agg_intrp_order=0))

    def test_order1_weights_move_density(self):
        """Order 1 density depends on the aggregation weights."""
        cfg = AggregatorConfig(agg_intrp_order=1)
        params = init_aggregator_params(jax.random.PRNGKey(1), cfg)
        # keep the density head out of the ReLU dead zone so the
        # comparison is non-degenerate regardless of the random draw
        params["density_head"][0]["bias"] = (
            params["density_head"][0]["bias"] + 1.0)
        emb, color, ndir, dists, pm, w, vd = make_inputs()
        s1, _ = decode_radiance(params, cfg, emb, color, ndir, dists, w,
                                pm, vd, jnp.eye(3))
        w2 = jnp.roll(w, 1, axis=-1)
        s2, _ = decode_radiance(params, cfg, emb, color, ndir, dists, w2,
                                pm, vd, jnp.eye(3))
        assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_act_super_softplus_density():
    """act_super uses softplus(x-1): strictly positive even where ReLU
    would clamp to zero (reference point_aggregators.py:261-266)."""
    s_relu, _ = run(AggregatorConfig(act_super=False))
    s_soft, _ = run(AggregatorConfig(act_super=True))
    assert np.all(np.asarray(s_soft) > 0)
    assert not np.allclose(np.asarray(s_relu), np.asarray(s_soft))

"""Aggregation weight kernels vs tiny numpy references.

Semantics from the reference's PointAggregator dist kernels
(reference: pointnerf/models/aggregators/point_aggregators.py:353-483)
and the post-normalization rule (:818-819).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.models.aggregator import (
    aggregation_weight, init_aggregator_params)
from pointnerf2studio_tpu.utils.spherical import sh_basis

RNG = np.random.default_rng(0)
M, K = 7, 8
DISTS = RNG.normal(size=(M, K, 6)).astype(np.float32) * 0.01
MASK = RNG.random((M, K)) > 0.3
MASK[0] = True
EMB = RNG.normal(size=(M, K, 32)).astype(np.float32)
VOX = 0.008


def run(kind, **kw):
    cfg = AggregatorConfig(agg_distance_kernel=kind, **kw)
    w, emb = aggregation_weight(cfg, jnp.asarray(EMB), jnp.asarray(DISTS),
                                jnp.asarray(MASK), VOX)
    return np.asarray(w), np.asarray(emb), cfg


def normed(w):
    return w / np.maximum(w.sum(-1, keepdims=True), 1e-8)


class TestWeightKernels:
    def test_linear(self):
        w, emb, _ = run("linear")
        ref = MASK / np.maximum(np.linalg.norm(DISTS[..., :3], axis=-1), 1e-6)
        np.testing.assert_allclose(w, normed(ref), rtol=1e-5)
        assert emb.shape[-1] == 32

    def test_quadric(self):
        w, _, _ = run("quadric")
        ref = MASK / np.maximum((DISTS[..., :3] ** 2).sum(-1), 1e-8)
        np.testing.assert_allclose(w, normed(ref), rtol=1e-5)

    def test_numquadric_normalizes_by_count(self):
        w, _, _ = run("numquadric")
        ref = MASK / np.maximum((DISTS ** 2).sum(-1), 1e-8)
        ref = ref / np.maximum(MASK.sum(-1, keepdims=True), 1)
        np.testing.assert_allclose(w, ref, rtol=1e-5)

    def test_numlinear(self):
        w, _, _ = run("numlinear")
        ref = MASK / np.maximum(np.linalg.norm(DISTS, axis=-1), 1e-6)
        ref = ref / np.maximum(MASK.sum(-1, keepdims=True), 1)
        np.testing.assert_allclose(w, ref, rtol=1e-5)

    def test_avg(self):
        w, _, _ = run("avg")
        np.testing.assert_allclose(w, normed(MASK.astype(np.float32)),
                                   rtol=1e-6)

    def test_trilinear(self):
        w, _, _ = run("trilinear")
        d = DISTS[..., :3] * MASK[..., None] / VOX
        d = 1 - np.abs(d)
        ref = MASK * d[..., 0] * d[..., 1] * d[..., 2]
        ref = ref / np.maximum(ref.sum(-1, keepdims=True), 1e-8)
        np.testing.assert_allclose(w, ref, rtol=1e-5)

    def test_sh_intrp_consumes_channels(self):
        w, emb, cfg = run("sh_intrp", sh_degree=3)
        assert emb.shape[-1] == 32 - 9
        assert cfg.shading_feature_dim == 23
        dn = np.linalg.norm(DISTS[..., :3], axis=-1)
        ddir = DISTS[..., :3] / np.maximum(dn[..., None], 1e-8)
        shall = np.asarray(sh_basis(jnp.asarray(ddir), 3))
        sig = 1 / (1 + np.exp(-shall * EMB[..., :9]))
        ref = MASK * sig.sum(-1) / np.maximum(dn, 1e-8)
        np.testing.assert_allclose(w, normed(ref), rtol=1e-4)

    def test_gau_intrp_consumes_channels(self):
        w, emb, cfg = run("gau_intrp")
        assert emb.shape[-1] == 32 - 7
        assert cfg.shading_feature_dim == 25
        assert np.all(w >= 0) and np.all(w[~MASK] == 0)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)

    def test_feat_intrp_learned_weights(self):
        """feat_intrp: sigmoid(MLP([PE(world delta), feat prefix]))
        consuming weight_feat_dim embedding channels (reference
        point_aggregators.py:226-237,277 — init-only upstream, the
        forward is the implied one)."""
        import jax
        cfg = AggregatorConfig(agg_distance_kernel="feat_intrp")
        params = init_aggregator_params(jax.random.PRNGKey(3), cfg)
        # declared tower: 20 -> 10 -> 10 -> 1
        dims = [(lyr["kernel"].shape) for lyr in params["feat_weight_mlp"]]
        assert dims == [(20, 10), (10, 10), (10, 1)]
        assert cfg.shading_feature_dim == 32 - 8
        w, emb = aggregation_weight(
            cfg, jnp.asarray(EMB), jnp.asarray(DISTS), jnp.asarray(MASK),
            VOX, params=params)
        w, emb = np.asarray(w), np.asarray(emb)
        assert emb.shape[-1] == 24
        assert np.all(w[~MASK] == 0) and np.all(w >= 0)
        # numpy oracle
        from pointnerf2studio_tpu.ops.encoding import positional_encoding
        pe = np.asarray(positional_encoding(jnp.asarray(DISTS[..., :3]), 2))
        x = np.concatenate([pe, EMB[..., :8]], -1)
        for lyr in params["feat_weight_mlp"][:-1]:
            x = x @ np.asarray(lyr["kernel"]) + np.asarray(lyr["bias"])
            x = np.where(x > 0, x, 0.01 * x)
        lyr = params["feat_weight_mlp"][-1]
        x = x @ np.asarray(lyr["kernel"]) + np.asarray(lyr["bias"])
        ref = MASK / (1 + np.exp(-x[..., 0]))
        np.testing.assert_allclose(w, normed(ref), rtol=1e-4)

    def test_feat_intrp_requires_params(self):
        cfg = AggregatorConfig(agg_distance_kernel="feat_intrp")
        with pytest.raises(ValueError, match="feat_weight_mlp"):
            aggregation_weight(cfg, jnp.asarray(EMB), jnp.asarray(DISTS),
                               jnp.asarray(MASK), VOX)

    def test_param_dims_follow_consumed_channels(self):
        import jax
        cfg = AggregatorConfig(agg_distance_kernel="sh_intrp", sh_degree=4)
        params = init_aggregator_params(jax.random.PRNGKey(0), cfg)
        feat_dim = 32 - 16
        expect = feat_dim + 2 * cfg.num_feat_freqs * feat_dim \
            + 2 * cfg.num_dist_freqs * cfg.dist_dim
        assert params["mlp_base"][0]["kernel"].shape[0] == expect


class TestSHBasis:
    def test_orthonormality(self):
        """Monte-Carlo check: int Y_i Y_j dOmega = delta_ij."""
        n = 200_000
        v = RNG.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        B = np.asarray(sh_basis(jnp.asarray(v.astype(np.float32)), 4))
        G = (B.T @ B) / n * 4 * np.pi
        np.testing.assert_allclose(G, np.eye(16), atol=0.05)

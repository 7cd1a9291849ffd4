"""Checkpoint interchange tests.

Golden test: the reference ships a DTU-trained MLP-only init checkpoint
(`best_net_ray_marching.pth`). We import it, verify the tower shapes,
and compare `decode_radiance` against an independent NumPy
re-implementation of the reference MLP math (SURVEY.md §3.1 hot loop)
running on the real imported weights — this pins down the weight
transpose conventions and the tower wiring.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.models.aggregator import decode_radiance
from pointnerf2studio_tpu.utils import checkpoint_io as cio

REF_CKPT = ("/root/reference/pointnerf/mvsnet_checkpoints/init/"
            "dtu_dgt_d012_img0123_conf_agg2_32_dirclr20/"
            "best_net_ray_marching.pth")

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_CKPT), reason="reference checkpoint not present")


def numpy_pe(x, nf, ori=False):
    freqs = 2.0 ** np.arange(nf)
    s = (x[..., None] * freqs).reshape(*x.shape[:-1], x.shape[-1] * nf)
    if ori:
        return np.concatenate([x, np.sin(s), np.cos(s)], -1)
    inter = np.stack([np.sin(s), np.cos(s)], -1)
    return inter.reshape(*s.shape[:-1], s.shape[-1] * 2)


def numpy_tower(layers, x):
    for lyr in layers:
        x = x @ np.asarray(lyr["kernel"]) + np.asarray(lyr["bias"])
        x = np.where(x > 0, x, 0.1 * x)
    return x


def numpy_reference_decode(params, cfg, emb, color, pdir, dists, weight,
                           mask, viewdirs, Rw2c):
    """Independent NumPy model of studio_model.py:300-365 (flat [M, K])."""
    de = numpy_pe(viewdirs, cfg.num_viewdir_freqs, ori=True)
    ori_vd, vd_pe = de[..., :3], de[..., 3:]

    dw = dists[..., :3] @ Rw2c
    dr = np.concatenate([dw, dists[..., 3:]], -1)
    dpe = numpy_pe(dr, cfg.num_dist_freqs)
    feat = np.concatenate([emb, numpy_pe(emb, cfg.num_feat_freqs), dpe], -1)
    feat = numpy_tower(params["mlp_base"], feat)

    nd = pdir @ Rw2c
    ov = ori_vd[:, None, :]
    feat = np.concatenate(
        [feat, color, nd - ov, np.sum(nd * ov, -1, keepdims=True)], -1)
    feat = numpy_tower(params["mlp_head"], feat)

    alpha = np.maximum(
        feat @ np.asarray(params["density_head"][0]["kernel"])
        + np.asarray(params["density_head"][0]["bias"]), 0)
    w = (weight * mask)[..., None]
    sigma = np.sum(alpha * w, -2)[..., 0]
    agg = np.sum(feat * w, -2)

    cin = np.concatenate([agg, vd_pe], -1)
    cf = numpy_tower(params["mlp_color"], cin)
    rgb = 1 / (1 + np.exp(-(cf @ np.asarray(params["color_head"][0]["kernel"])
                            + np.asarray(params["color_head"][0]["bias"]))))
    rgb = rgb * 1.002 - 1e-3
    return sigma, rgb


@needs_ref
class TestReferenceImport:
    def test_shapes(self):
        params = cio.import_aggregator_params(
            cio.load_torch_state_dict(REF_CKPT))
        assert params["mlp_base"][0]["kernel"].shape == (284, 256)
        assert params["mlp_base"][1]["kernel"].shape == (256, 256)
        assert params["mlp_head"][0]["kernel"].shape == (263, 256)
        assert params["density_head"][0]["kernel"].shape == (256, 1)
        assert [l["kernel"].shape for l in params["mlp_color"]] == [
            (280, 128), (128, 128), (128, 128)]
        assert params["color_head"][0]["kernel"].shape == (128, 3)

    def test_golden_forward(self, rng):
        """decode_radiance on real weights == independent NumPy model."""
        params = cio.import_aggregator_params(
            cio.load_torch_state_dict(REF_CKPT))
        cfg = AggregatorConfig()
        M, K = 15, 8
        emb = rng.standard_normal((M, K, 32)).astype(np.float32) * 0.3
        color = rng.uniform(size=(M, K, 3)).astype(np.float32)
        pdir = rng.standard_normal((M, K, 3)).astype(np.float32)
        pdir /= np.linalg.norm(pdir, axis=-1, keepdims=True)
        dists = rng.standard_normal((M, K, 6)).astype(np.float32) * 0.01
        mask = rng.uniform(size=(M, K)) > 0.3
        w = rng.uniform(size=(M, K)).astype(np.float32) * mask
        w /= np.maximum(w.sum(-1, keepdims=True), 1e-8)
        vd = rng.standard_normal((M, 3)).astype(np.float32)
        vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
        eye = np.eye(3, dtype=np.float32)

        sigma, rgb = decode_radiance(
            params, cfg,
            neigh_emb=jnp.asarray(emb), neigh_color=jnp.asarray(color),
            neigh_dir=jnp.asarray(pdir), dists=jnp.asarray(dists),
            weight=jnp.asarray(w), pnt_mask=jnp.asarray(mask),
            viewdirs=jnp.asarray(vd), Rw2c=jnp.asarray(eye))
        sigma_np, rgb_np = numpy_reference_decode(
            params, cfg, emb, color, pdir, dists, w,
            mask.astype(np.float32), vd, eye)
        np.testing.assert_allclose(np.asarray(sigma), sigma_np, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(rgb), rgb_np, rtol=2e-3, atol=2e-3)


class TestRoundtrip:
    def test_export_import(self, rng, tmp_path):
        from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
        from pointnerf2studio_tpu.models import neural_points as npts

        params = init_aggregator_params(jax.random.PRNGKey(1), AggregatorConfig())
        n = 50
        cloud = npts.from_arrays(
            rng.standard_normal((n, 3)).astype(np.float32),
            rng.standard_normal((n, 32)).astype(np.float32),
            rng.uniform(size=(n, 1)).astype(np.float32),
            rng.standard_normal((n, 3)).astype(np.float32),
            rng.uniform(size=(n, 3)).astype(np.float32),
            capacity=64)
        path = str(tmp_path / "0_net_ray_marching.pth")
        cio.export_torch_checkpoint(params, cloud, path)
        params2, cloud2 = cio.load_reference_checkpoint(path)
        assert cloud2 is not None

        for tower in ("mlp_base", "mlp_head", "mlp_color",
                      "density_head", "color_head"):
            for a, b in zip(params[tower], params2[tower]):
                np.testing.assert_array_equal(a["kernel"], b["kernel"])
                np.testing.assert_array_equal(a["bias"], b["bias"])
        # only the 50 live points round-trip
        assert cloud2.capacity == 50
        np.testing.assert_array_equal(
            np.asarray(cloud2.xyz), np.asarray(cloud.xyz)[:50])
        np.testing.assert_array_equal(
            np.asarray(cloud2.points_embeding),
            np.asarray(cloud.points_embeding)[:50])


def test_states_file_roundtrip(tmp_path):
    from pointnerf2studio_tpu.utils.checkpoint_io import (
        export_states_file, load_states_file)
    p = str(tmp_path / "5000_states.pth")
    export_states_file(p, epoch_count=3, total_steps=5000, best_PSNR=31.2)
    d = load_states_file(p)
    assert d["epoch_count"] == 3
    assert d["total_steps"] == 5000
    assert abs(d["best_PSNR"] - 31.2) < 1e-6

"""MVSNet/FPN parity tests against a torch oracle.

The oracle is a minimal torch model assembled here (from the
architecture spec in SURVEY.md §2.2 / the reference's mvsnet.py) and
loaded with the SAME pretrained checkpoints — so any numeric mismatch
in the JAX port (conv layout, BN stats, transpose-conv padding,
grid-sample semantics) fails loudly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from pointnerf2studio_tpu.models.mvsnet import (
    load_fpn_params, load_mvsnet_params, mvsnet_depth)
from pointnerf2studio_tpu.models.mvsnet.featurenet import fpn_features, premlp_embed
from pointnerf2studio_tpu.models.mvsnet.layers import bilinear_grid_sample
from pointnerf2studio_tpu.models.mvsnet.mvsnet import (
    cost_reg_net, feature_net, homo_warp)

MVS_CKPT = "/root/reference/pointnerf/mvsnet_checkpoints/MVSNet/model_000014.ckpt"
FPN_CKPT = ("/root/reference/pointnerf/mvsnet_checkpoints/init/"
            "dtu_dgt_d012_img0123_conf_agg2_32_dirclr20/best_net_mvs.pth")

needs_ckpt = pytest.mark.skipif(
    not os.path.exists(MVS_CKPT), reason="pretrained MVSNet absent")


def torch_sd(path, strip="module."):
    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("model", ck) if isinstance(ck, dict) else ck
    return {k.replace(strip, ""): v for k, v in sd.items()}


class TorchConvBnReLU(nn.Module):
    def __init__(self, i, o, k=3, s=1, p=1, relu=True, three_d=False):
        super().__init__()
        conv = nn.Conv3d if three_d else nn.Conv2d
        bn = nn.BatchNorm3d if three_d else nn.BatchNorm2d
        self.conv = conv(i, o, k, stride=s, padding=p, bias=False)
        self.bn = bn(o)
        self.relu = relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.relu else x


class TorchMVSFeature(nn.Module):
    """Oracle of the official MVSNet FeatureNet (stride 4, 32ch)."""

    def __init__(self):
        super().__init__()
        self.conv0 = TorchConvBnReLU(3, 8, 3, 1, 1)
        self.conv1 = TorchConvBnReLU(8, 8, 3, 1, 1)
        self.conv2 = TorchConvBnReLU(8, 16, 5, 2, 2)
        self.conv3 = TorchConvBnReLU(16, 16, 3, 1, 1)
        self.conv4 = TorchConvBnReLU(16, 16, 3, 1, 1)
        self.conv5 = TorchConvBnReLU(16, 32, 5, 2, 2)
        self.conv6 = TorchConvBnReLU(32, 32, 3, 1, 1)
        self.feature = nn.Conv2d(32, 32, 3, 1, 1)

    def forward(self, x):
        x = self.conv1(self.conv0(x))
        x = self.conv4(self.conv3(self.conv2(x)))
        return self.feature(self.conv6(self.conv5(x)))


class TorchCostReg(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = TorchConvBnReLU(32, 8, three_d=True)
        self.conv1 = TorchConvBnReLU(8, 16, s=2, three_d=True)
        self.conv2 = TorchConvBnReLU(16, 16, three_d=True)
        self.conv3 = TorchConvBnReLU(16, 32, s=2, three_d=True)
        self.conv4 = TorchConvBnReLU(32, 32, three_d=True)
        self.conv5 = TorchConvBnReLU(32, 64, s=2, three_d=True)
        self.conv6 = TorchConvBnReLU(64, 64, three_d=True)
        mk = lambda i, o: nn.Sequential(
            nn.ConvTranspose3d(i, o, 3, padding=1, output_padding=1,
                               stride=2, bias=False),
            nn.BatchNorm3d(o), nn.ReLU(inplace=True))
        self.conv7, self.conv9, self.conv11 = mk(64, 32), mk(32, 16), mk(16, 8)
        self.prob = nn.Conv3d(8, 1, 3, stride=1, padding=1)

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        c4 = self.conv4(self.conv3(c2))
        x = self.conv6(self.conv5(c4))
        x = c4 + self.conv7(x)
        x = c2 + self.conv9(x)
        x = c0 + self.conv11(x)
        return self.prob(x)


def load_prefixed(module, sd, prefix):
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    module.load_state_dict(sub)
    module.eval()
    return module


@needs_ckpt
class TestMVSNetParity:
    @pytest.fixture(scope="class")
    def params(self):
        return load_mvsnet_params(MVS_CKPT)

    @pytest.fixture(scope="class")
    def sd(self):
        return torch_sd(MVS_CKPT)

    def test_feature_net(self, params, sd, rng):
        img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        ours = np.asarray(feature_net(params["feature"], jnp.asarray(img)))
        oracle = load_prefixed(TorchMVSFeature(), sd, "feature.")
        with torch.no_grad():
            ref = oracle(torch.from_numpy(img.transpose(2, 0, 1))[None]
                         )[0].numpy().transpose(1, 2, 0)
        assert ours.shape == ref.shape == (8, 8, 32)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_cost_reg_net(self, params, sd, rng):
        vol = rng.standard_normal((16, 8, 8, 32)).astype(np.float32)
        ours = np.asarray(cost_reg_net(params["costreg"], jnp.asarray(vol)))
        oracle = load_prefixed(TorchCostReg(), sd, "cost_regularization.")
        with torch.no_grad():
            ref = oracle(torch.from_numpy(
                vol.transpose(3, 0, 1, 2))[None])[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_homo_warp_matches_grid_sample(self, rng):
        """homo_warp vs torch grid_sample(align_corners=False) — the
        semantics the reference executes under torch>=1.3."""
        H = W = 16
        C = 4
        feat = rng.standard_normal((H, W, C)).astype(np.float32)
        proj = np.eye(4, dtype=np.float32)
        proj[:3, :3] += rng.standard_normal((3, 3)) * 0.01
        proj[:3, 3] = rng.standard_normal(3) * 0.1
        depths = np.linspace(2, 6, 5).astype(np.float32)
        ours = np.asarray(homo_warp(jnp.asarray(feat), jnp.asarray(proj),
                                    jnp.asarray(depths)))
        # torch reference path
        y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        xyz = np.stack([x.ravel(), y.ravel(), np.ones(H * W)], 0)
        rd = (proj[:3, :3] @ xyz)[:, None, :] * depths[None, :, None]
        pxyz = rd + proj[:3, 3][:, None, None]
        xy = pxyz[:2] / pxyz[2]
        gx = xy[0] / ((W - 1) / 2) - 1
        gy = xy[1] / ((H - 1) / 2) - 1
        grid = torch.from_numpy(
            np.stack([gx, gy], -1).reshape(1, 5 * H, W, 2).astype(np.float32))
        with torch.no_grad():
            ref = F.grid_sample(
                torch.from_numpy(feat.transpose(2, 0, 1))[None], grid,
                mode="bilinear", padding_mode="zeros", align_corners=False)
        ref = ref[0].numpy().reshape(C, 5, H, W).transpose(1, 2, 3, 0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_depth_pipeline_finite(self, params, rng):
        imgs = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
        projs = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        for v in range(1, 3):
            projs[v, :3, 3] = rng.standard_normal(3) * 0.05
        depths = np.linspace(2, 6, 32).astype(np.float32)
        d, c, p = mvsnet_depth(params, jnp.asarray(imgs), jnp.asarray(projs),
                               jnp.asarray(depths))
        assert d.shape == (8, 8) and c.shape == (8, 8)
        assert np.all(np.isfinite(np.asarray(d)))
        assert np.all((np.asarray(d) >= 2) & (np.asarray(d) <= 6))
        assert np.all((np.asarray(c) >= 0) & (np.asarray(c) <= 1.0 + 1e-5))
        np.testing.assert_allclose(np.asarray(p).sum(0), 1.0, rtol=1e-4)


@pytest.mark.skipif(not os.path.exists(FPN_CKPT), reason="FPN ckpt absent")
class TestFPNParity:
    @pytest.fixture(scope="class")
    def params(self):
        return load_fpn_params(FPN_CKPT)

    def test_fpn_features(self, params, rng):
        """Oracle: torch convs with the same weights, NO relu
        (models.py:697-698 quirk)."""
        sd = torch_sd(FPN_CKPT, strip="")
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        outs = fpn_features(params, jnp.asarray(img))
        assert [o.shape for o in outs] == [
            (16, 16, 3), (16, 16, 8), (8, 8, 16), (4, 4, 32)]

        x = torch.from_numpy(img.transpose(2, 0, 1))[None]

        def convbn(x, prefix, s, p):
            w = sd[f"{prefix}.conv.weight"]
            x = F.conv2d(x, w, stride=s, padding=p)
            return F.batch_norm(
                x, sd[f"{prefix}.bn.running_mean"],
                sd[f"{prefix}.bn.running_var"], sd[f"{prefix}.bn.weight"],
                sd[f"{prefix}.bn.bias"], training=False)

        with torch.no_grad():
            x1 = convbn(convbn(x, "FeatureNet.conv0.0", 1, 1),
                        "FeatureNet.conv0.1", 1, 1)
            x2 = convbn(convbn(convbn(x1, "FeatureNet.conv1.0", 2, 2),
                               "FeatureNet.conv1.1", 1, 1),
                        "FeatureNet.conv1.2", 1, 1)
            x3 = convbn(convbn(convbn(x2, "FeatureNet.conv2.0", 2, 2),
                               "FeatureNet.conv2.1", 1, 1),
                        "FeatureNet.conv2.2", 1, 1)
            x3 = F.conv2d(x3, sd["FeatureNet.toplayer.weight"],
                          sd["FeatureNet.toplayer.bias"])
        for ours, ref in zip(outs[1:], (x1, x2, x3)):
            np.testing.assert_allclose(
                np.asarray(ours), ref[0].numpy().transpose(1, 2, 0),
                rtol=1e-3, atol=1e-4)

    def test_premlp(self, params, rng):
        sd = torch_sd(FPN_CKPT, strip="")
        feats = rng.standard_normal((10, 56)).astype(np.float32)
        colors = rng.uniform(size=(10, 3)).astype(np.float32)
        dirs = rng.standard_normal((10, 3)).astype(np.float32)
        conf = rng.uniform(size=(10, 1)).astype(np.float32)
        ours = np.asarray(premlp_embed(params, *map(jnp.asarray,
                                                    (feats, colors, dirs, conf))))
        x = torch.from_numpy(np.concatenate([feats, colors, dirs, conf], -1))
        with torch.no_grad():
            h = F.relu(x @ sd["premlp.0.weight"].T + sd["premlp.0.bias"])
            ref = (h @ sd["premlp.2.weight"].T + sd["premlp.2.bias"]).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestGridSample:
    def test_matches_torch_grid_sample(self, rng):
        for ac in (False, True):
            img = rng.standard_normal((7, 9, 3)).astype(np.float32)
            grid = rng.uniform(-1.3, 1.3, size=(50, 2)).astype(np.float32)
            ours = np.asarray(bilinear_grid_sample(
                jnp.asarray(img), jnp.asarray(grid), align_corners=ac))
            with torch.no_grad():
                ref = F.grid_sample(
                    torch.from_numpy(img.transpose(2, 0, 1))[None],
                    torch.from_numpy(grid)[None, None],
                    mode="bilinear", padding_mode="zeros", align_corners=ac)
            np.testing.assert_allclose(
                ours, ref[0, :, 0].numpy().T, rtol=1e-4, atol=1e-5)

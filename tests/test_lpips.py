"""JAX LPIPS: structure sanity + full numeric parity against a torch
re-implementation of the same net (random weights — exercises the conv
stack, taps, normalization, and linear heads; pretrained weights are
imported with the same code path)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from pointnerf2studio_tpu.utils import lpips as L

RNG = np.random.default_rng(0)


def rand_img(h=33, w=35):
    return RNG.random((h, w, 3)).astype(np.float32)


class TestStructure:
    def test_identical_images_zero(self):
        p = L.init_random_params("alex")
        img = rand_img(64, 64)
        assert float(L.lpips_distance(p, img, img)) == pytest.approx(0.0)

    def test_different_images_positive(self):
        p = L.init_random_params("alex")
        a = rand_img(64, 64)
        b = np.clip(a + 0.3 * RNG.standard_normal(a.shape), 0, 1
                    ).astype(np.float32)
        assert float(L.lpips_distance(p, a, b)) > 0.0


def _torch_net(params, cfg):
    layers = []
    ci = 0
    for item in cfg:
        if item[0] == "conv":
            c = params["convs"][ci]
            ci += 1
            k, s, pad = item[2], item[3], item[4]
            conv = nn.Conv2d(c["w"].shape[2], c["w"].shape[3], k,
                             stride=s, padding=pad)
            conv.weight.data = torch.from_numpy(
                np.transpose(c["w"], (3, 2, 0, 1)).copy())
            conv.bias.data = torch.from_numpy(c["b"].copy())
            layers.append(conv)
        elif item[0] == "relu":
            layers.append(nn.ReLU())
        else:
            layers.append(nn.MaxPool2d(item[1], item[2]))
    return nn.Sequential(*layers)


def _torch_lpips(params, net_name, img, gt):
    cfg, taps, _ = L.CONFIGS[net_name]
    net = _torch_net(params, cfg)
    shift = torch.tensor(L._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(L._SCALE).view(1, 3, 1, 1)

    def feats(x):
        x = torch.from_numpy(x.transpose(2, 0, 1).copy())[None] * 2 - 1
        x = (x - shift) / scale
        out = []
        for i, l in enumerate(net):
            x = l(x)
            if i in taps:
                out.append(x)
        return out

    with torch.no_grad():
        fx, fy = feats(img), feats(gt)
        total = 0.0
        for f1, f2, w in zip(fx, fy, params["lins"]):
            n1 = f1 / torch.sqrt((f1 ** 2).sum(1, keepdim=True) + 1e-10)
            n2 = f2 / torch.sqrt((f2 ** 2).sum(1, keepdim=True) + 1e-10)
            d = (n1 - n2) ** 2 * torch.from_numpy(w).view(1, -1, 1, 1)
            total += float(d.sum(1).mean())
    return total


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_parity_with_torch(net):
    p = L.init_random_params(net, seed=1)
    a = rand_img(64, 64)
    b = np.clip(a + 0.2 * RNG.standard_normal(a.shape), 0, 1
                ).astype(np.float32)
    ours = float(L.lpips_distance(p, a, b))
    ref = _torch_lpips(p, net, a, b)
    np.testing.assert_allclose(ours, ref, rtol=2e-3)


def test_torch_weight_import_roundtrip(tmp_path):
    """A combined state dict in the documented format loads into the
    same values the torch net carries."""
    p = L.init_random_params("alex", seed=2)
    cfg, _, chans = L.CONFIGS["alex"]
    sd = {}
    j = 0
    ci = 0
    for item in cfg:
        if item[0] == "conv":
            c = p["convs"][ci]
            sd[f"features.{j}.weight"] = torch.from_numpy(
                np.transpose(c["w"], (3, 2, 0, 1)).copy())
            sd[f"features.{j}.bias"] = torch.from_numpy(c["b"].copy())
            ci += 1
        j += 1
    for l, ch in enumerate(chans):
        sd[f"lin{l}.model.1.weight"] = torch.from_numpy(
            p["lins"][l].reshape(1, ch, 1, 1).copy())
    sd["net"] = "alex"
    path = str(tmp_path / "lpips_alex_combined.pth")
    torch.save(sd, path)

    loaded = L.load_torch_lpips_weights(path)
    a, b = rand_img(48, 48), rand_img(48, 48)
    np.testing.assert_allclose(
        float(L.lpips_distance(loaded, a, b)),
        float(L.lpips_distance(p, a, b)), rtol=1e-5)

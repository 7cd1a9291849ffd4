"""FPN FeatureNet + premlp: per-point appearance embeddings.

JAX port of the reference's feature-extraction net used to embed images
onto generated points (reference: pointnerf/models/mvs/models.py:716-764
FeatureNet(intermediate=True), and the premlp applied in
mvs_points_model.py:query_embedding:255-257). Weights import from
`best_net_mvs.pth`.

Faithful quirk: the reference's `ConvBnReLU` in models.py has NO ReLU in
its forward (`bn(conv(x))`, models.py:697-698) — reproduced here.

In intermediate mode the net returns 4 levels: the raw image (layer 0,
used as point color), conv0 (8ch, full res), conv1 (16ch, 1/2 res),
toplayer(conv2) (32ch, 1/4 res). The `imgfeat_0_0123` config gathers
all four at each point via bilinear sampling.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.mvsnet.layers import (
    conv2d, conv_bn, conv_params_from_torch, import_conv_bn)

FPNParams = Dict


def load_fpn_params(path: str) -> FPNParams:
    """Import best_net_mvs.pth (FeatureNet.* + premlp.*)."""
    import torch

    sd_t = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd_t, "state_dict"):
        sd_t = sd_t.state_dict()
    sd = {k: v.numpy() for k, v in sd_t.items()}

    p: FPNParams = {}
    p["conv0"] = [import_conv_bn(sd, f"FeatureNet.conv0.{i}") for i in range(2)]
    p["conv1"] = [import_conv_bn(sd, f"FeatureNet.conv1.{i}") for i in range(3)]
    p["conv2"] = [import_conv_bn(sd, f"FeatureNet.conv2.{i}") for i in range(3)]
    p["toplayer"] = {
        "w": conv_params_from_torch(sd["FeatureNet.toplayer.weight"]),
        "b": jnp.asarray(sd["FeatureNet.toplayer.bias"]),
    }
    if "premlp.0.weight" in sd:
        p["premlp"] = [
            {"kernel": jnp.asarray(sd["premlp.0.weight"].T.copy()),
             "bias": jnp.asarray(sd["premlp.0.bias"])},
            {"kernel": jnp.asarray(sd["premlp.2.weight"].T.copy()),
             "bias": jnp.asarray(sd["premlp.2.bias"])},
        ]
    return p


def fpn_features(p: FPNParams, img: jnp.ndarray) -> List[jnp.ndarray]:
    """[H, W, 3] -> [raw, 8ch@1x, 16ch@1/2, 32ch@1/4] (NHWC, no batch)."""
    x = img[None]
    strides0 = [1, 1]
    pads0 = [1, 1]
    x1 = x
    for lp, s, pd in zip(p["conv0"], strides0, pads0):
        x1 = conv_bn(x1, lp, s, pd, relu=False)
    x2 = x1
    for lp, s, pd in zip(p["conv1"], [2, 1, 1], [2, 1, 1]):
        x2 = conv_bn(x2, lp, s, pd, relu=False)
    x3 = x2
    for lp, s, pd in zip(p["conv2"], [2, 1, 1], [2, 1, 1]):
        x3 = conv_bn(x3, lp, s, pd, relu=False)
    x3 = conv2d(x3, p["toplayer"]["w"], 1, 0) + p["toplayer"]["b"]
    return [img, x1[0], x2[0], x3[0]]


def premlp_embed(p: FPNParams, feats: jnp.ndarray, colors: jnp.ndarray,
                 dirs: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """[N, 56] feats + [N,3] colors + [N,3] dirs + [N,1] conf -> [N, 32].

    Mirrors query_embedding's premlp concat order
    (mvs_points_model.py:255-257); ReLU between the two Linear layers
    (the premlp is nn.Sequential(Linear, ReLU, Linear)).
    """
    x = jnp.concatenate([feats, colors, dirs, conf], axis=-1)
    x = x @ p["premlp"][0]["kernel"] + p["premlp"][0]["bias"]
    x = jax.nn.relu(x)
    return x @ p["premlp"][1]["kernel"] + p["premlp"][1]["bias"]

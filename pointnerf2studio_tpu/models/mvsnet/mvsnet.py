"""MVSNet depth estimation (pretrained, inference).

JAX re-implementation of the official MVSNet used by the reference for
point-cloud initialization (reference:
pointnerf/models/mvs/depth_estimators/mvsnet.py:7-143 and module.py:
36-85): FeatureNet (stride 4, 32ch), homography-warped variance cost
volume, CostRegNet 3D U-Net, softmax -> depth regression + 4-window
photometric confidence. Weights import from `model_000014.ckpt`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.mvsnet.layers import (
    batch_norm, bilinear_grid_sample, bn_params_from_torch, conv2d, conv3d,
    conv3d_transpose, conv_bn, conv_params_from_torch, import_conv_bn)

MVSNetParams = Dict


def load_mvsnet_params(path: str) -> MVSNetParams:
    """Import the pretrained official-MVSNet checkpoint (torch)."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd_t = ck.get("model", ck) if isinstance(ck, dict) else ck
    sd = {k.replace("module.", ""): v.numpy() for k, v in sd_t.items()}

    p: MVSNetParams = {"feature": {}, "costreg": {}}
    for name in ("conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"):
        p["feature"][name] = import_conv_bn(sd, f"feature.{name}")
    p["feature"]["out"] = {
        "w": conv_params_from_torch(sd["feature.feature.weight"]),
        "b": jnp.asarray(sd["feature.feature.bias"]),
    }
    cr = p["costreg"]
    for name in ("conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"):
        cr[name] = import_conv_bn(sd, f"cost_regularization.{name}")
    for name in ("conv7", "conv9", "conv11"):
        cr[name] = {
            "w": conv_params_from_torch(
                sd[f"cost_regularization.{name}.0.weight"]),
            "bn": bn_params_from_torch(sd, f"cost_regularization.{name}.1"),
        }
    cr["prob"] = {
        "w": conv_params_from_torch(sd["cost_regularization.prob.weight"]),
        "b": jnp.asarray(sd["cost_regularization.prob.bias"]),
    }
    return p


def feature_net(p: Dict, img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] -> [H/4, W/4, 32] (mvsnet.py:7-27)."""
    x = img[None]
    x = conv_bn(x, p["conv0"], 1, 1)
    x = conv_bn(x, p["conv1"], 1, 1)
    x = conv_bn(x, p["conv2"], 2, 2)
    x = conv_bn(x, p["conv3"], 1, 1)
    x = conv_bn(x, p["conv4"], 1, 1)
    x = conv_bn(x, p["conv5"], 2, 2)
    x = conv_bn(x, p["conv6"], 1, 1)
    x = conv2d(x, p["out"]["w"], 1, 1) + p["out"]["b"]
    return x[0]


def cost_reg_net(p: Dict, vol: jnp.ndarray) -> jnp.ndarray:
    """3D U-Net regularization [D, H, W, 32] -> [D, H, W] raw cost
    (mvsnet.py:30-70).

    The 3-level stride-2 U-Net needs every spatial/depth dim divisible
    by 8 for the transpose-conv skip adds (the torch reference has the
    same constraint and is only ever fed /8-divisible crops); arbitrary
    image sizes (e.g. 400^2 -> 100-wide feature grids) are handled by
    edge-padding up to the next multiple and cropping the output.
    """
    D0, H0, W0 = vol.shape[:3]
    pd = (-D0) % 8
    ph = (-H0) % 8
    pw = (-W0) % 8
    if pd or ph or pw:
        vol = jnp.pad(vol, ((0, pd), (0, ph), (0, pw), (0, 0)),
                      mode="edge")
    x = vol[None]
    c0 = conv_bn(x, p["conv0"], 1, 1, three_d=True)
    c2 = conv_bn(conv_bn(c0, p["conv1"], 2, 1, three_d=True),
                 p["conv2"], 1, 1, three_d=True)
    c4 = conv_bn(conv_bn(c2, p["conv3"], 2, 1, three_d=True),
                 p["conv4"], 1, 1, three_d=True)
    x = conv_bn(conv_bn(c4, p["conv5"], 2, 1, three_d=True),
                p["conv6"], 1, 1, three_d=True)
    x = c4 + jax.nn.relu(batch_norm(
        conv3d_transpose(x, p["conv7"]["w"]), p["conv7"]["bn"]))
    x = c2 + jax.nn.relu(batch_norm(
        conv3d_transpose(x, p["conv9"]["w"]), p["conv9"]["bn"]))
    x = c0 + jax.nn.relu(batch_norm(
        conv3d_transpose(x, p["conv11"]["w"]), p["conv11"]["bn"]))
    x = conv3d(x, p["prob"]["w"], 1, 1) + p["prob"]["b"]
    return x[0, :D0, :H0, :W0, 0]


def homo_warp(feat: jnp.ndarray, proj: jnp.ndarray,
              depth_values: jnp.ndarray,
              align_corners: bool = False) -> jnp.ndarray:
    """Warp a source feature map into the ref frustum per depth plane.

    feat [H, W, C]; proj = src_proj @ inv(ref_proj) [4,4] (3x4 used);
    depth_values [D]. Returns [D, H, W, C]
    (reference: module.py:36-71; torch>=1.3 runs grid_sample with
    align_corners=False, reproduced here by default).
    """
    H, W, C = feat.shape
    D = depth_values.shape[0]
    rot, trans = proj[:3, :3], proj[:3, 3]
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xyz = jnp.stack([x.ravel(), y.ravel(), jnp.ones(H * W)], 0)   # [3, HW]
    rot_xyz = rot @ xyz                                           # [3, HW]
    rd = rot_xyz[:, None, :] * depth_values[None, :, None]        # [3, D, HW]
    proj_xyz = rd + trans[:, None, None]
    z = proj_xyz[2]
    xy = proj_xyz[:2] / z                                         # [2, D, HW]
    gx = xy[0] / ((W - 1) / 2) - 1
    gy = xy[1] / ((H - 1) / 2) - 1
    grid = jnp.stack([gx, gy], -1).reshape(D, H, W, 2)
    return bilinear_grid_sample(feat, grid, align_corners=align_corners)


def mvsnet_depth(
    params: MVSNetParams,
    imgs: jnp.ndarray,            # [V, H, W, 3] ref first
    proj_mats: jnp.ndarray,       # [V, 4, 4] src @ inv(ref) convention
    depth_values: jnp.ndarray,    # [D]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Depth + photometric confidence for the reference view.

    Returns (depth [H/4, W/4], conf [H/4, W/4], prob_volume [D, H/4, W/4]).
    Matches MVSNet.forward (mvsnet.py:98-143): variance cost volume over
    warped features, CostRegNet, softmax over depth, expectation depth,
    4-window summed probability at the argmax-expectation bin.
    """
    V = imgs.shape[0]
    feats = jnp.stack([feature_net(params["feature"], imgs[v])
                       for v in range(V)])                        # [V,h,w,32]
    D = depth_values.shape[0]
    h, w, C = feats.shape[1:]

    vol_sum = jnp.zeros((D, h, w, C))
    vol_sq = jnp.zeros((D, h, w, C))
    for v in range(V):
        warped = homo_warp(feats[v], proj_mats[v], depth_values)
        vol_sum = vol_sum + warped
        vol_sq = vol_sq + warped ** 2
    variance = vol_sq / V - (vol_sum / V) ** 2

    cost = cost_reg_net(params["costreg"], variance)              # [D, h, w]
    prob = jax.nn.softmax(cost, axis=0)

    depth = jnp.sum(prob * depth_values[:, None, None], axis=0)

    # photometric confidence: sum of 4 adjacent depth probabilities
    # around the expectation index (mvsnet.py:132-136: avg_pool3d over a
    # (4,1,1) window after padding (1, 2) along depth, x4).
    pp = jnp.pad(prob, ((1, 2), (0, 0), (0, 0)))
    prob4 = (pp[:-3] + pp[1:-2] + pp[2:-1] + pp[3:])              # [D, h, w]
    didx = jnp.sum(prob * jnp.arange(D, dtype=jnp.float32)[:, None, None],
                   axis=0).astype(jnp.int32)
    conf = jnp.take_along_axis(prob4, didx[None], axis=0)[0]
    return depth, conf, prob

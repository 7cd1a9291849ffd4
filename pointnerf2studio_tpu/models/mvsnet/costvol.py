"""Learned depth-probability point generation (joint MVS training).

TPU-native re-build of the reference's `manual_depth_view == -1` stack —
the trainable alternative to the pretrained-MVSNet depth path used when
MVS and Point-NeRF are optimized jointly (reference:
pointnerf/models/mvs/models.py:660-684 `create_mvs(mvs_mode=-1)`,
models.py:885-1003 `MVSNet.build_volume_costvar_img`/`forward`,
models.py:766-821 `CostRegNet`/`ProbNet`, and
pointnerf/models/mvs/mvs_points_model.py:141-167 `gau_single_sampler` /
`prob_filter`).

Pipeline (all differentiable, one jitted program per reference view):
  FPN features (1/4 res, 32ch)
  -> plane-sweep cost volume at D depth bins over [near, far]:
       [ref RGB, warped src RGBs, variance of warped features]
       = 3*V + 32 channels (V views, pad `pad` pixels)
  -> CostRegNet 3-D U-Net -> 8-channel volume
  -> ProbNet (1x conv3d + BN) -> softmax over depth = depth probability
  -> expected depth + std per pixel, prob_filter mask
  -> gaussian depth sample -> camera-space points.

Faithful quirk kept: the reference's ConvBnReLU/ConvBnReLU3D in
models.py apply NO ReLU (`bn(conv(x))`, models.py:697-713).

Design difference (deliberate): convolutions run in NHWC/NDHWC layouts
(XLA TPU-native) and the cost volume is built as one [D, h, w, C]
tensor fed to fused conv ops — no in-place channel writes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.mvsnet.layers import (
    batch_norm, bilinear_grid_sample, conv3d, conv3d_transpose, conv_bn)

CostVolParams = Dict


def _xavier_uniform(key, shape, fan_in, fan_out, gain=1.0):
    lim = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -lim, lim)


def _init_conv_bn(key, cin, cout, ksize=3, three_d=True):
    """Conv (no bias) + BN params, xavier-uniform like the reference's
    `init_weights` default (helpers/networks.py:126-141)."""
    kd = (ksize,) * (3 if three_d else 2)
    shape = kd + (cin, cout)
    rf = int(np.prod(kd))
    w = _xavier_uniform(key, shape, cin * rf, cout * rf)
    return {
        "w": w,
        "bn": {
            "scale": jnp.ones((cout,)),
            "bias": jnp.zeros((cout,)),
            "mean": jnp.zeros((cout,)),
            "var": jnp.ones((cout,)),
        },
    }


def init_fpn_params(key) -> Dict:
    """Random-init FeatureNet(intermediate=True) (models.py:716-764)."""
    ks = jax.random.split(key, 10)
    p: Dict = {}
    p["conv0"] = [_init_conv_bn(ks[0], 3, 8, 3, False),
                  _init_conv_bn(ks[1], 8, 8, 3, False)]
    p["conv1"] = [_init_conv_bn(ks[2], 8, 16, 5, False),
                  _init_conv_bn(ks[3], 16, 16, 3, False),
                  _init_conv_bn(ks[4], 16, 16, 3, False)]
    p["conv2"] = [_init_conv_bn(ks[5], 16, 32, 5, False),
                  _init_conv_bn(ks[6], 32, 32, 3, False),
                  _init_conv_bn(ks[7], 32, 32, 3, False)]
    p["toplayer"] = {
        "w": _xavier_uniform(ks[8], (1, 1, 32, 32), 32, 32),
        "b": jnp.zeros((32,)),
    }
    return p


def init_premlp_params(key, in_dim: int = 63, out_dim: int = 32,
                       num_layers: int = 1) -> List[Dict]:
    """premlp: Linear/ReLU stack embedding warped features -> point
    features (mvs_points_model.py:21-32)."""
    layers = []
    ks = jax.random.split(key, max(num_layers, 1))
    d = in_dim
    relu_gain = float(np.sqrt(2.0))
    for i in range(num_layers):
        gain = relu_gain if i < num_layers - 1 else 1.0
        layers.append({
            "kernel": _xavier_uniform(ks[i], (d, out_dim), d, out_dim, gain),
            "bias": jnp.zeros((out_dim,)),
        })
        d = out_dim
    return layers


def _init_conv_bn_T(key, cin, cout, ksize=3):
    """Transpose-conv (+BN) in the torch-imported layout expected by
    `conv3d_transpose`: [kd, kh, kw, O, I]."""
    p = _init_conv_bn(key, cout, cin, ksize, three_d=True)
    return {"w": p["w"], "bn": {
        "scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
        "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))}}


def init_costvol_params(key, num_views: int = 3) -> CostVolParams:
    """CostRegNet(3V+32 -> 8ch) + ProbNet(8 -> 1) (models.py:766-821)."""
    ks = jax.random.split(key, 12)
    cin = 3 * num_views + 32
    cr = {
        "conv0": _init_conv_bn(ks[0], cin, 8),
        "conv1": _init_conv_bn(ks[1], 8, 16),
        "conv2": _init_conv_bn(ks[2], 16, 16),
        "conv3": _init_conv_bn(ks[3], 16, 32),
        "conv4": _init_conv_bn(ks[4], 32, 32),
        "conv5": _init_conv_bn(ks[5], 32, 64),
        "conv6": _init_conv_bn(ks[6], 64, 64),
        "conv7": _init_conv_bn_T(ks[7], 64, 32),
        "conv9": _init_conv_bn_T(ks[8], 32, 16),
        "conv11": _init_conv_bn_T(ks[9], 16, 8),
    }
    prob = _init_conv_bn(ks[10], 8, 1)
    return {"costreg": cr, "probnet": prob}


def cost_reg_net8(p: Dict, vol: jnp.ndarray) -> jnp.ndarray:
    """[D, h, w, Cin] -> [D, h, w, 8] (models.py:766-810; unlike the
    depth-estimator CostRegNet this one keeps an 8-channel output and
    applies no ReLU anywhere). Dims are edge-padded to multiples of 8
    for the stride-2 U-Net skip adds and cropped back (same constraint
    as the torch reference, which only sees /8-divisible crops)."""
    D0, H0, W0 = vol.shape[:3]
    pd, ph, pw = (-D0) % 8, (-H0) % 8, (-W0) % 8
    if pd or ph or pw:
        vol = jnp.pad(vol, ((0, pd), (0, ph), (0, pw), (0, 0)),
                      mode="edge")
    x = vol[None]
    c0 = conv_bn(x, p["conv0"], 1, 1, relu=False, three_d=True)
    c2 = conv_bn(conv_bn(c0, p["conv1"], 2, 1, relu=False, three_d=True),
                 p["conv2"], 1, 1, relu=False, three_d=True)
    c4 = conv_bn(conv_bn(c2, p["conv3"], 2, 1, relu=False, three_d=True),
                 p["conv4"], 1, 1, relu=False, three_d=True)
    x = conv_bn(conv_bn(c4, p["conv5"], 2, 1, relu=False, three_d=True),
                p["conv6"], 1, 1, relu=False, three_d=True)
    x = c4 + batch_norm(conv3d_transpose(x, p["conv7"]["w"]),
                        p["conv7"]["bn"])
    x = c2 + batch_norm(conv3d_transpose(x, p["conv9"]["w"]),
                        p["conv9"]["bn"])
    x = c0 + batch_norm(conv3d_transpose(x, p["conv11"]["w"]),
                        p["conv11"]["bn"])
    return x[0, :D0, :H0, :W0]


def prob_net(p: Dict, vol8: jnp.ndarray) -> jnp.ndarray:
    """[D, h, w, 8] -> depth probability [D, h, w] (softmax over D;
    models.py:812-821)."""
    x = conv3d(vol8[None], p["w"], 1, 1)
    x = batch_norm(x, p["bn"])[0, ..., 0]
    return jax.nn.softmax(x, axis=0)


def homo_warp_pad(feat: jnp.ndarray, proj: jnp.ndarray,
                  depth_values: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Warp a source map into the (padded) ref frustum per depth plane.

    feat [H, W, C]; proj [4,4] = src_proj @ inv(ref_proj) at feat res;
    depth_values [D]. Returns [D, H+2p, W+2p, C]. Matches
    mvs_utils.homo_warp (mvs_utils.py:423-473): ref pixel grid shifted
    by -pad, grid_sample align_corners=True, zero padding outside.
    """
    H, W, C = feat.shape
    D = depth_values.shape[0]
    Hp, Wp = H + 2 * pad, W + 2 * pad
    rot, trans = proj[:3, :3], proj[:3, 3]
    y, x = jnp.meshgrid(jnp.arange(Hp, dtype=jnp.float32) - pad,
                        jnp.arange(Wp, dtype=jnp.float32) - pad,
                        indexing="ij")
    xyz = jnp.stack([x.ravel(), y.ravel(), jnp.ones(Hp * Wp)], 0)  # [3,HW]
    # src = R @ ref + T / depth  (the reference divides T by depth and
    # multiplies through later — equivalent to projecting ref * depth)
    rd = rot @ xyz                                                 # [3, HW]
    proj_xyz = rd[:, None, :] + (trans[:, None] / depth_values)[:, :, None]
    z = proj_xyz[2]
    xy = proj_xyz[:2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    gx = xy[0] / ((W - 1) / 2) - 1
    gy = xy[1] / ((H - 1) / 2) - 1
    grid = jnp.stack([gx, gy], -1).reshape(D, Hp, Wp, 2)
    return bilinear_grid_sample(feat, grid, align_corners=True)


def build_cost_volume(
    imgs_q: jnp.ndarray,       # [V, h, w, 3] images at feature res
    feats: jnp.ndarray,        # [V, h, w, 32] FPN top-level features
    proj_mats: jnp.ndarray,    # [V, 4, 4] src @ inv(ref) at feature res
    depth_values: jnp.ndarray, # [D]
    vid: int = 0,
    pad: int = 0,
) -> jnp.ndarray:
    """[D, h+2p, w+2p, 3V+32] cost volume (models.py:891-946):
    channels = [ref RGB (broadcast over D), each warped src RGB,
    variance of (ref + warped src) features, in-mask weighted]."""
    V, h, w, C = feats.shape
    D = depth_values.shape[0]
    Hp, Wp = h + 2 * pad, w + 2 * pad

    ref_feat = jnp.pad(feats[vid], ((pad, pad), (pad, pad), (0, 0)))
    vol_sum = jnp.broadcast_to(ref_feat[None], (D, Hp, Wp, C))
    vol_sq = vol_sum ** 2
    in_cnt = jnp.ones((D, Hp, Wp))                      # ref always in

    rgb_layers = [jnp.broadcast_to(
        jnp.pad(imgs_q[vid], ((pad, pad), (pad, pad), (0, 0)))[None],
        (D, Hp, Wp, 3))]
    for v in range(V):
        if v == vid:
            continue
        warped = homo_warp_pad(
            jnp.concatenate([feats[v], imgs_q[v]], -1),
            proj_mats[v], depth_values, pad)             # [D,Hp,Wp,C+3]
        wf, wrgb = warped[..., :C], warped[..., C:]
        # in-frustum mask from the same grid math (recomputed cheaply
        # via nonzero warped alpha is NOT faithful; use coordinates):
        vol_sum = vol_sum + wf
        vol_sq = vol_sq + wf ** 2
        rgb_layers.append(wrgb)
        # reference counts a src view wherever its sample grid lands
        # inside (-1, 1)^2 (models.py:930-933)
        rot, trans = proj_mats[v][:3, :3], proj_mats[v][:3, 3]
        y, x = jnp.meshgrid(jnp.arange(Hp, dtype=jnp.float32) - pad,
                            jnp.arange(Wp, dtype=jnp.float32) - pad,
                            indexing="ij")
        xyz = jnp.stack([x.ravel(), y.ravel(), jnp.ones(Hp * Wp)], 0)
        rd = rot @ xyz
        pxyz = rd[:, None, :] + (trans[:, None] / depth_values)[:, :, None]
        z = pxyz[2]
        xy = pxyz[:2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        gx = (xy[0] / ((w - 1) / 2) - 1).reshape(D, Hp, Wp)
        gy = (xy[1] / ((h - 1) / 2) - 1).reshape(D, Hp, Wp)
        inm = ((gx > -1) & (gx < 1) & (gy > -1) & (gy < 1))
        in_cnt = in_cnt + inm.astype(jnp.float32)

    cnt = 1.0 / in_cnt[..., None]
    variance = vol_sq * cnt - (vol_sum * cnt) ** 2
    return jnp.concatenate(rgb_layers + [variance], axis=-1)


def depth_probability(
    params: CostVolParams,
    imgs_q: jnp.ndarray,
    feats: jnp.ndarray,
    proj_mats: jnp.ndarray,
    near_far: Tuple[float, float],
    num_depth: int = 128,
    vid: int = 0,
    pad: int = 0,
) -> jnp.ndarray:
    """Full learned-depth forward: cost volume -> CostRegNet -> ProbNet.

    Returns prob [D, h+2p, w+2p] (softmax over depth). Depth planes are
    linear in depth over [near, far] (models.py:964-968, lindisp off).
    """
    near, far = near_far
    t = jnp.linspace(0.0, 1.0, num_depth)
    depth_values = near * (1 - t) + far * t
    vol = build_cost_volume(imgs_q, feats, proj_mats, depth_values,
                            vid=vid, pad=pad)
    vol8 = cost_reg_net8(params["costreg"], vol)
    return prob_net(params["probnet"], vol8)


def expected_depth_std(prob: jnp.ndarray,
                       dprob_thresh: float = 0.8,
                       num_neighbor: int = 1):
    """Per-pixel NDC expected depth, std, and prob_filter mask
    (mvs_points_model.py:141-150,184-196).

    The reference's prob_filter gathers `num_neighbor` probability bins
    around ceil(expected_ndc_depth) — NOTE it indexes bins with the NDC
    depth value (in [0,1]) rather than a bin index, so for the default
    num_neighbor=1 the mask is effectively prob[bin 1] + ... > thresh
    only when expected depth rounds that way; we reproduce the literal
    computation.
    """
    D = prob.shape[0]
    v = 1.0 / D
    ndc_depths = (jnp.arange(D, dtype=jnp.float32) * v
                  + 0.5 * v)[:, None, None]
    e = jnp.sum(prob * ndc_depths, axis=0)                     # [h, w]
    std = jnp.sqrt(jnp.sum(prob * (ndc_depths - e) ** 2, axis=0))
    ceil_idx = jnp.ceil(e)
    lower = ceil_idx - num_neighbor // 2 + 1
    shifts = jnp.arange(num_neighbor, dtype=jnp.float32)[:, None, None]
    idx = jnp.clip(lower[None] + shifts, 0, D - 1).astype(jnp.int32)
    sel = jnp.take_along_axis(prob, idx, axis=0)
    mask = jnp.sum(sel, axis=0) > dprob_thresh
    return e, std, mask

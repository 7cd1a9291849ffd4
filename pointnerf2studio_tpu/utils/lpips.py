"""LPIPS perceptual metric in JAX (alex + vgg variants).

The reference reports lpips-alex and lpips-vgg over rendered/GT image
pairs (reference: pointnerf/run/evaluate.py:34-97, inputs scaled to
[-1, 1]). This is a from-scratch JAX implementation of LPIPS v0.1:

    d(x, y) = sum_l mean_hw( || w_l * (phi_l(x)^ - phi_l(y)^) ||^2 )

where phi_l are AlexNet/VGG16 conv features, ^ is channel-unit
normalization, and w_l are the learned 1x1 linear weights.

Weights are NOT bundled (this machine has no torchvision/lpips
downloads; zero egress). `load_torch_lpips_weights` imports a combined
torch state dict — the torchvision backbone `features.*` tensors plus
the lpips package's `lin*.model.1.weight` heads — produced on any
machine with those packages by `export_lpips_weights` below. Metrics
code degrades gracefully (reports lpips only when a weight file is
supplied/found).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, kernel, stride, padding) conv stacks; "M" = 3x3/2 or
# 2x2/2 max-pool. Feature taps are taken after each listed ReLU.
_ALEX_CFG = [  # torchvision AlexNet.features
    ("conv", 64, 11, 4, 2), ("relu",), ("pool", 3, 2),
    ("conv", 192, 5, 1, 2), ("relu",), ("pool", 3, 2),
    ("conv", 384, 3, 1, 1), ("relu",),
    ("conv", 256, 3, 1, 1), ("relu",),
    ("conv", 256, 3, 1, 1), ("relu",),
]
_ALEX_TAPS = (1, 4, 7, 9, 11)          # indices (after relu) in _ALEX_CFG
_ALEX_CHANNELS = (64, 192, 384, 256, 256)

_VGG_CFG = [  # torchvision VGG16.features (through conv5_3)
    ("conv", 64, 3, 1, 1), ("relu",), ("conv", 64, 3, 1, 1), ("relu",),
    ("pool", 2, 2),
    ("conv", 128, 3, 1, 1), ("relu",), ("conv", 128, 3, 1, 1), ("relu",),
    ("pool", 2, 2),
    ("conv", 256, 3, 1, 1), ("relu",), ("conv", 256, 3, 1, 1), ("relu",),
    ("conv", 256, 3, 1, 1), ("relu",),
    ("pool", 2, 2),
    ("conv", 512, 3, 1, 1), ("relu",), ("conv", 512, 3, 1, 1), ("relu",),
    ("conv", 512, 3, 1, 1), ("relu",),
    ("pool", 2, 2),
    ("conv", 512, 3, 1, 1), ("relu",), ("conv", 512, 3, 1, 1), ("relu",),
    ("conv", 512, 3, 1, 1), ("relu",),
]
_VGG_TAPS = (3, 8, 15, 22, 29)
_VGG_CHANNELS = (64, 128, 256, 512, 512)

# lpips ScalingLayer constants (lpips/lpips.py v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

CONFIGS = {"alex": (_ALEX_CFG, _ALEX_TAPS, _ALEX_CHANNELS),
           "vgg": (_VGG_CFG, _VGG_TAPS, _VGG_CHANNELS)}


def init_random_params(net: str = "alex", seed: int = 0) -> Dict:
    """Random-weight parameter tree (structure tests / smoke use only —
    NOT a perceptual metric)."""
    cfg, taps, chans = CONFIGS[net]
    rng = np.random.default_rng(seed)
    convs: List[Dict[str, np.ndarray]] = []
    c_in = 3
    for item in cfg:
        if item[0] == "conv":
            c_out, k = item[1], item[2]
            convs.append({
                "w": rng.normal(0, 0.1, (k, k, c_in, c_out)).astype(
                    np.float32),
                "b": np.zeros((c_out,), np.float32)})
            c_in = c_out
    lins = [np.abs(rng.normal(0, 0.01, (c,))).astype(np.float32)
            for c in chans]
    return {"convs": convs, "lins": lins, "net": net}


def _features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [N, H, W, 3] in [-1, 1] -> tapped feature maps (NHWC)."""
    cfg, taps, _ = CONFIGS[params["net"]]
    x = (x - _SHIFT) / _SCALE
    feats = []
    ci = 0
    for i, item in enumerate(cfg):
        if item[0] == "conv":
            c = params["convs"][ci]
            ci += 1
            pad = item[4]
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(c["w"]), (item[3], item[3]),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + jnp.asarray(c["b"])
        elif item[0] == "relu":
            x = jax.nn.relu(x)
            if i in taps:
                feats.append(x)
        else:  # pool
            k, s = item[1], item[2]
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
                "VALID")
    return feats


def lpips_distance(params: Dict, img: jnp.ndarray,
                   gt: jnp.ndarray) -> jnp.ndarray:
    """LPIPS between two [H, W, 3] images in [0, 1] (evaluate.py
    scales to [-1, 1] before the net)."""
    x = img[None] * 2.0 - 1.0
    y = gt[None] * 2.0 - 1.0
    fx = _features(params, x)
    fy = _features(params, y)
    total = jnp.zeros(())
    for f1, f2, w in zip(fx, fy, params["lins"]):
        n1 = f1 / jnp.sqrt(jnp.sum(f1 ** 2, -1, keepdims=True) + 1e-10)
        n2 = f2 / jnp.sqrt(jnp.sum(f2 ** 2, -1, keepdims=True) + 1e-10)
        d = (n1 - n2) ** 2 * jnp.asarray(w)     # 1x1 conv == channel scale
        total = total + jnp.mean(jnp.sum(d, -1))
    return total


def load_torch_lpips_weights(path: str) -> Dict:
    """Import a combined torch state dict: torchvision backbone
    (`features.<i>.weight/bias`, OIHW) + lpips linear heads
    (`lin<l>.model.1.weight`, [1, C, 1, 1]). See
    `export_lpips_weights` for producing the file."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    net = sd.get("net", "alex")
    if hasattr(net, "item"):
        net = str(net)
    cfg, _, chans = CONFIGS[net]
    convs = []
    # torchvision indexes layers within nn.Sequential(features); our
    # cfg lists the same layers in the same order
    tv_idx = []
    j = 0
    for it in cfg:
        if it[0] == "conv":
            tv_idx.append(j)
        j += 1
    for i in tv_idx:
        w = sd[f"features.{i}.weight"].numpy()       # [O, I, kh, kw]
        b = sd[f"features.{i}.bias"].numpy()
        convs.append({"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                      "b": b.astype(np.float32)})
    lins = []
    for l, c in enumerate(chans):
        w = sd[f"lin{l}.model.1.weight"].numpy().reshape(c)
        lins.append(np.maximum(w, 0.0).astype(np.float32))
    return {"convs": convs, "lins": lins, "net": net}


EXPORT_SNIPPET = '''\
# Run on any machine with torchvision + lpips installed:
import torch, torchvision, lpips
net = "alex"   # or "vgg"
backbone = (torchvision.models.alexnet(weights="DEFAULT") if net == "alex"
            else torchvision.models.vgg16(weights="DEFAULT")).features
loss = lpips.LPIPS(net=net, version="0.1")
sd = {f"features.{k}": v for k, v in backbone.state_dict().items()}
for l in range(5):
    sd[f"lin{l}.model.1.weight"] = getattr(loss, f"lin{l}").model[1].weight.data
sd["net"] = net
torch.save(sd, f"lpips_{net}_combined.pth")
'''


def find_weights(net: str = "alex") -> Optional[str]:
    """Look for a combined weight file in the conventional locations."""
    import os
    for d in (os.environ.get("LPIPS_WEIGHTS_DIR", ""),
              os.path.expanduser("~/.cache/pointnerf2studio_tpu")):
        if not d:
            continue
        p = os.path.join(d, f"lpips_{net}_combined.pth")
        if os.path.exists(p):
            return p
    return None

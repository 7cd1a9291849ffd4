"""Conv/BN building blocks for the MVS networks, with torch weight import.

The reference's MVS stack is inference-only in the point-generation
pipeline (pretrained `model_000014.ckpt` and `best_net_mvs.pth` are
loaded and used frozen — reference:
pointnerf/models/mvs/mvs_points_model.py:305-320, dev_scripts use
manual_depth_view=1), so BatchNorm is applied with stored running
statistics. Convs run in NHWC/NDHWC (TPU-friendly); torch OIHW kernels
are transposed at import.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def conv_params_from_torch(w: np.ndarray) -> jnp.ndarray:
    """torch conv weight [O, I, *S] -> lax [*S, I, O]."""
    nd = w.ndim - 2
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    return jnp.asarray(np.transpose(w, perm).copy())


def bn_params_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def batch_norm(x: jnp.ndarray, bn: Dict[str, jnp.ndarray],
               eps: float = 1e-5) -> jnp.ndarray:
    """Inference BN over the trailing channel axis."""
    inv = jax.lax.rsqrt(bn["var"] + eps)
    return (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           pad: int = 1) -> jnp.ndarray:
    """NHWC conv; w is [kh, kw, I, O]."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           pad: int = 1) -> jnp.ndarray:
    """NDHWC conv; w is [kd, kh, kw, I, O]."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3,
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_transpose(x: jnp.ndarray, w_torch_layout: jnp.ndarray,
                     stride: int = 2, pad: int = 1,
                     output_pad: int = 1) -> jnp.ndarray:
    """torch ConvTranspose3d(k, stride, padding, output_padding).

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel (the standard transpose-conv identity). `w_torch_layout` is
    the imported torch weight [kd, kh, kw, O, I] -> note torch stores
    ConvTranspose weights as [I, O, *S], so import with
    conv_params_from_torch which yields [*S, O, I]; we flip + swap here.
    """
    w = jnp.flip(w_torch_layout, axis=(0, 1, 2))          # rot180 spatial
    w = jnp.swapaxes(w, -1, -2)                           # [.., I, O]
    k = w.shape[0]
    lo = k - 1 - pad
    hi = k - 1 - pad + output_pad
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=[(lo, hi)] * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_bn(x, p: Dict, stride: int = 1, pad: int = 1, relu: bool = True,
            three_d: bool = False) -> jnp.ndarray:
    conv = conv3d if three_d else conv2d
    x = batch_norm(conv(x, p["w"], stride=stride, pad=pad), p["bn"])
    return jax.nn.relu(x) if relu else x


def import_conv_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    return {
        "w": conv_params_from_torch(sd[f"{prefix}.conv.weight"]),
        "bn": bn_params_from_torch(sd, f"{prefix}.bn"),
    }


def bilinear_grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                         align_corners: bool = False) -> jnp.ndarray:
    """torch F.grid_sample(mode=bilinear, padding_mode=zeros) for NHWC.

    img: [H, W, C]; grid: [..., 2] with normalized coords in [-1, 1]
    (x = width axis first, like torch). Returns [..., C].
    """
    H, W, C = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return v * inb[..., None].astype(img.dtype)

    v = (tap(x0i, y0i) * ((1 - wx) * (1 - wy))[..., None]
         + tap(x0i + 1, y0i) * (wx * (1 - wy))[..., None]
         + tap(x0i, y0i + 1) * ((1 - wx) * wy)[..., None]
         + tap(x0i + 1, y0i + 1) * (wx * wy)[..., None])
    return v

"""Image quality metrics: PSNR, SSIM, RMSE.

Replaces the reference's metric stack (torchmetrics PSNR, skimage SSIM
with win_size=11/uniform window, skimage RMSE — reference:
pointnerf/nerfstudio/studio_model.py:40-53,433-464 and
pointnerf/run/evaluate.py:34-97). LPIPS requires pretrained torch
feature nets that are not available in this environment; `lpips()`
raises with a clear message unless the optional dependency is present.
"""

from __future__ import annotations

import numpy as np


def psnr(img: np.ndarray, ref: np.ndarray, data_range: float = 1.0) -> float:
    mse = np.mean((np.asarray(img, np.float64) - np.asarray(ref, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def rmse(img: np.ndarray, ref: np.ndarray) -> float:
    return float(np.sqrt(np.mean(
        (np.asarray(img, np.float64) - np.asarray(ref, np.float64)) ** 2)))


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """Mean filter with window `size` over the first two axes ('valid')."""
    c = np.cumsum(np.cumsum(x, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)) + ((0, 0),) * (x.ndim - 2))
    s = (c[size:, size:] - c[:-size, size:] - c[size:, :-size]
         + c[:-size, :-size])
    return s / (size * size)


def ssim(img: np.ndarray, ref: np.ndarray, data_range: float = 1.0,
         win_size: int = 11) -> float:
    """Structural similarity, skimage-compatible settings.

    Uniform window (gaussian_weights=False), per-channel then averaged,
    sample covariance normalization (N/(N-1)) — matches
    skimage.metrics.structural_similarity(win_size=11, channel_axis=2,
    data_range=1.0) used by the reference (studio_model.py:40-46).
    """
    x = np.asarray(img, np.float64)
    y = np.asarray(ref, np.float64)
    if x.ndim == 2:
        x, y = x[..., None], y[..., None]
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)

    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2 * ux * uy + C1
    a2 = 2 * vxy + C2
    b1 = ux ** 2 + uy ** 2 + C1
    b2 = vx + vy + C2
    s = (a1 * a2) / (b1 * b2)
    # skimage crops (win_size-1)//2 from each side of the valid map —
    # _uniform_filter already produced the valid region, so mean directly.
    return float(s.mean())


_LPIPS_CACHE: dict = {}


def lpips(img: np.ndarray, ref: np.ndarray, net: str = "alex",
          weights_path: str | None = None) -> float:
    """LPIPS v0.1 (reference: run/evaluate.py:62-75 uses lpips-alex and
    lpips-vgg on [-1,1] inputs).

    Resolution order: (1) the JAX implementation
    (utils/lpips.py) with a combined weight file — `weights_path`, or
    `$LPIPS_WEIGHTS_DIR/lpips_<net>_combined.pth` (see
    lpips.EXPORT_SNIPPET for producing one); (2) the optional torch
    `lpips` package. Raises RuntimeError when neither is available
    (callers degrade gracefully)."""
    from pointnerf2studio_tpu.utils import lpips as ljax

    path = weights_path or ljax.find_weights(net)
    if path is not None:
        key = (net, path)
        if key not in _LPIPS_CACHE:
            _LPIPS_CACHE[key] = ljax.load_torch_lpips_weights(path)
        return float(ljax.lpips_distance(
            _LPIPS_CACHE[key], np.asarray(img, np.float32),
            np.asarray(ref, np.float32)))
    try:
        import lpips as lpips_pkg  # type: ignore
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "LPIPS needs either a combined weight file (see "
            "pointnerf2studio_tpu.utils.lpips.EXPORT_SNIPPET) or the "
            "torch `lpips` package") from e
    model = lpips_pkg.LPIPS(net=net)
    t = lambda a: torch.from_numpy(
        np.asarray(a, np.float32).transpose(2, 0, 1))[None] * 2 - 1
    with torch.no_grad():
        return float(model(t(img), t(ref)).item())


def compute_all(img: np.ndarray, ref: np.ndarray) -> dict:
    out = {
        "psnr": psnr(img, ref),
        "ssim": ssim(img, ref),
        "rmse": rmse(img, ref),
    }
    try:
        out["lpips"] = lpips(img, ref, net="alex")
        out["vgglpips"] = lpips(img, ref, net="vgg")
    except RuntimeError:
        pass    # no weights in this environment; PSNR/SSIM/RMSE only
    return out


def metrics_over_dirs(pred_dir: str, gt_dir: str,
                      pattern: str = "*.png") -> dict:
    """Standalone metric computation over two directories of rendered /
    ground-truth PNG pairs (reference: pointnerf/run/evaluate.py:34-110,
    invoked after training and as a CLI). Pairs are matched by sorted
    filename order. LPIPS is included only if the optional torch
    `lpips` package is importable."""
    import glob as _glob
    import os

    from PIL import Image

    preds = sorted(_glob.glob(os.path.join(pred_dir, pattern)))
    gts = sorted(_glob.glob(os.path.join(gt_dir, pattern)))
    if not preds or len(preds) != len(gts):
        raise ValueError(
            f"mismatched image sets: {len(preds)} vs {len(gts)}")

    acc = {"psnr": [], "ssim": [], "rmse": []}
    for p, g in zip(preds, gts):
        a = np.asarray(Image.open(p), np.float32)[..., :3] / 255.0
        b = np.asarray(Image.open(g), np.float32)[..., :3] / 255.0
        acc["psnr"].append(psnr(a, b))
        acc["ssim"].append(ssim(a, b))
        acc["rmse"].append(rmse(a, b))
    out = {k: float(np.mean(v)) for k, v in acc.items()}
    try:
        out["lpips"] = float(np.mean(
            [lpips(np.asarray(Image.open(p), np.float32)[..., :3] / 255.0,
                   np.asarray(Image.open(g), np.float32)[..., :3] / 255.0)
             for p, g in zip(preds, gts)]))
    except (ImportError, RuntimeError):
        pass
    out["n_images"] = len(preds)
    return out

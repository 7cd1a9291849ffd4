"""Synthetic scenes for tests, compile checks, and benchmarks.

A colored sphere point cloud + pinhole cameras: enough structure to
exercise the full render/train path (hits, misses, view-dependence)
without any dataset on disk.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import PointNerfConfig, QueryConfig
from pointnerf2studio_tpu.models import neural_points as npts
from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
from pointnerf2studio_tpu.models.neural_points import NeuralPointCloud
from pointnerf2studio_tpu.ops.grid import PointGrid, build_grid_from_points


@dataclasses.dataclass
class SphereScene:
    cfg: PointNerfConfig
    cloud: NeuralPointCloud
    grid: PointGrid
    params: dict
    campos: jnp.ndarray
    camrotc2w: jnp.ndarray
    near: float
    far: float


def sphere_config(sr: int = 24, k: int = 8, d: int = 120) -> PointNerfConfig:
    return PointNerfConfig(
        query=QueryConfig(
            vsize=(0.02, 0.02, 0.02), vscale=(2, 2, 2),
            SR=sr, K=k, P=12, max_o=200_000, z_depth_dim=d),
    )


def make_sphere_scene(
    n_points: int = 20_000,
    seed: int = 0,
    cfg: PointNerfConfig | None = None,
    positive_density: bool = True,
) -> SphereScene:
    rng = np.random.default_rng(seed)
    cfg = cfg or sphere_config()

    pts = rng.standard_normal((n_points, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts *= 0.5
    colors = (pts + 0.5).clip(0, 1)
    dirs = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    emb = rng.standard_normal((n_points, 32)).astype(np.float32) * 0.1
    conf = np.full((n_points, 1), 0.8, np.float32)

    cloud = npts.from_arrays(pts, emb, conf, dirs, colors)
    grid = build_grid_from_points(cloud.xyz, cloud.alive, cfg.query)
    params = init_aggregator_params(jax.random.PRNGKey(seed), cfg.agg)
    if positive_density:
        # random init leaves the single ReLU density head ~all-negative;
        # bias it up so renders have visible content without training.
        params["density_head"][0]["bias"] = (
            params["density_head"][0]["bias"] + 5.0)

    return SphereScene(
        cfg=cfg, cloud=cloud, grid=grid, params=params,
        campos=jnp.array([0.0, 0.0, 2.0]),
        camrotc2w=jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]]),
        near=1.0, far=3.0,
    )


def camera_rays(
    campos_ignored, camrotc2w, height: int, width: int, focal: float
) -> jnp.ndarray:
    """Normalized world-space ray directions for a pinhole camera."""
    i, j = np.meshgrid(np.arange(width), np.arange(height))
    x = (i + 0.5 - width / 2) / focal
    y = (j + 0.5 - height / 2) / focal
    d = np.stack([x, y, np.ones_like(x)], -1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rot = np.asarray(camrotc2w)
    return jnp.asarray((d @ rot.T).astype(np.float32))

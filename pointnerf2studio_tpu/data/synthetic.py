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


def make_chair_scene(
    n_points: int = 558_000,
    seed: int = 0,
    cfg: PointNerfConfig | None = None,
    jitter_sigma_voxels: float = 0.5,
) -> SphereScene:
    """Chair-shaped synthetic scene at NeRF-Synthetic chair geometry.

    Points are sampled ON the procedural SDF chair surface
    (data/procedural.chair_sdf — seat slab, legs, backrest, slats:
    flat surfaces, thin structures, concavities) and jittered by
    `jitter_sigma_voxels` scaled voxels, approximating an MVS-init
    cloud's depth noise. Camera sits on the blender ring (radius
    4.031) looking at the origin, near/far = [2, 6] — the reference
    chair's exact ray range (dev_scripts/w_n360/chair_points.sh).
    Occupancy statistics (surface shells, empty interior sweeps,
    silhouette misses) therefore match a real chair far better than
    the sphere-shell scene (VERDICT r1 bench caveat).
    """
    import jax.numpy as jnp_  # noqa: F401 (jax used below)

    from pointnerf2studio_tpu.data.procedural import _albedo, chair_sdf

    rng = np.random.default_rng(seed)
    cfg = cfg or sphere_config()
    lo = np.array([-0.72, -0.70, -1.00], np.float32)
    hi = np.array([0.66, 0.71, 1.05], np.float32)

    def sdf_only(p):
        return chair_sdf(p)[0]

    @jax.jit
    def project(p):
        # 4 Newton steps along the numerical SDF gradient
        eps = 1e-4
        for _ in range(4):
            d = sdf_only(p)
            g = jnp.stack([
                (sdf_only(p + jnp.array([eps, 0, 0])) -
                 sdf_only(p - jnp.array([eps, 0, 0]))),
                (sdf_only(p + jnp.array([0, eps, 0])) -
                 sdf_only(p - jnp.array([0, eps, 0]))),
                (sdf_only(p + jnp.array([0, 0, eps])) -
                 sdf_only(p - jnp.array([0, 0, eps]))),
            ], -1) / (2 * eps)
            g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1,
                                                keepdims=True), 1e-6)
            p = p - d[:, None] * g
        return p, sdf_only(p), g

    pts_l, col_l, dir_l = [], [], []
    have = 0
    while have < n_points:
        cand = rng.uniform(lo, hi, (2 * n_points, 3)).astype(np.float32)
        p, d, g = project(jnp.asarray(cand))
        keep = np.abs(np.asarray(d)) < 1e-3
        p_np = np.asarray(p)[keep]
        g_np = np.asarray(g)[keep]
        _, part = chair_sdf(jnp.asarray(p_np))
        col = np.asarray(_albedo(jnp.asarray(p_np), part))
        pts_l.append(p_np)
        col_l.append(col)
        dir_l.append(g_np)
        have += p_np.shape[0]
    pts = np.concatenate(pts_l)[:n_points]
    colors = np.concatenate(col_l)[:n_points].clip(0, 1)
    dirs = np.concatenate(dir_l)[:n_points]
    dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-6)
    sv = float(cfg.query.vsize[2] * cfg.query.vscale[2])
    pts = pts + rng.normal(
        0, jitter_sigma_voxels * sv, pts.shape).astype(np.float32)

    emb = rng.standard_normal((n_points, 32)).astype(np.float32) * 0.1
    conf = np.full((n_points, 1), 0.8, np.float32)
    cloud = npts.from_arrays(pts.astype(np.float32), emb, conf,
                             dirs.astype(np.float32),
                             colors.astype(np.float32))
    grid = build_grid_from_points(cloud.xyz, cloud.alive, cfg.query)
    params = init_aggregator_params(jax.random.PRNGKey(seed), cfg.agg)
    params["density_head"][0]["bias"] = (
        params["density_head"][0]["bias"] + 5.0)

    # blender-ring camera (az 30 deg, el 30 deg), opencv axes:
    # x right, y down, z forward (towards the origin)
    radius = 4.0311289
    az, el = np.deg2rad(30.0), np.deg2rad(30.0)
    campos = radius * np.array([np.cos(el) * np.sin(az),
                                -np.cos(el) * np.cos(az),
                                np.sin(el)], np.float32)
    fwd = -campos / np.linalg.norm(campos)
    right = np.cross(fwd, np.array([0.0, 0.0, 1.0], np.float32))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    camrotc2w = jnp.asarray(np.stack([right, down, fwd], -1),
                            jnp.float32)

    return SphereScene(
        cfg=cfg, cloud=cloud, grid=grid, params=params,
        campos=jnp.asarray(campos), camrotc2w=camrotc2w,
        near=2.0, far=6.0,
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

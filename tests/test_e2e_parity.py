"""Full-pipeline golden parity: jitted renderer vs C++ oracle + NumPy.

The strongest correctness statement the suite makes: one render of a
small scene through `render_rays_jit` must match an INDEPENDENT
pipeline built from (a) the native C++ querier (grid build + masking +
first-SR selection + layered K-NN, pointnerf2studio_tpu/native), and
(b) the pure-NumPy decoder/compositor modeled directly on the
reference math (studio_model.py:263-399). No JAX code is shared
between the two sides past ray generation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import PointNerfConfig, QueryConfig
from pointnerf2studio_tpu.models import neural_points as npts
from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
from pointnerf2studio_tpu.models.render import render_rays_jit
from pointnerf2studio_tpu.native import query_ref
from pointnerf2studio_tpu.ops.grid import build_grid_from_points

from test_checkpoint_io import numpy_pe, numpy_reference_decode

RNG = np.random.default_rng(21)


def build_scene(use_cache):
    n = 2000
    v = RNG.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    xyz = (v * 0.5).astype(np.float32)
    # vsize chosen so the sample spacing exceeds 2*vsize_z and every
    # step length clamps to vsize_z on both sides (the reference's
    # raydist_mode_unit regime) -> exact dist parity
    cfg = PointNerfConfig(query=QueryConfig(
        vsize=(0.02,) * 3, vscale=(2, 2, 2), SR=12, K=8, P=12,
        max_o=100_000, z_depth_dim=40, use_cache=use_cache,
        cand_cap=27 * 12, max_q=200_000, compact_budget=10))
    cloud = npts.from_arrays(
        xyz, (RNG.normal(size=(n, 32)) * 0.2).astype(np.float32),
        np.full((n, 1), 0.7, np.float32), v.astype(np.float32),
        RNG.uniform(size=(n, 3)).astype(np.float32))
    grid = build_grid_from_points(cloud.xyz, cloud.alive, cfg.query)
    params = init_aggregator_params(jax.random.PRNGKey(3), cfg.agg)
    params["density_head"][0]["bias"] = (
        params["density_head"][0]["bias"] + 20.0)
    return cfg, cloud, grid, params


def make_rays(campos, camrot, h, w, focal):
    i, j = np.meshgrid(np.arange(w), np.arange(h))
    d = np.stack([(i - w / 2 + 0.5) / focal, (j - h / 2 + 0.5) / focal,
                  np.ones_like(i, np.float32)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (d.reshape(-1, 3) @ camrot.T).astype(np.float32)


def numpy_pipeline(cfg, cloud, grid, params, campos, camrot, raydirs,
                   near, far):
    """Oracle query + NumPy decode + NumPy compositing."""
    q = cfg.query
    R = raydirs.shape[0]
    D, SR, K = q.z_depth_dim, q.SR, q.K

    mids = near + (np.arange(D) + 0.5) * (far - near) / D
    raypos = (campos + raydirs[:, None, :] * mids[None, :, None]
              ).astype(np.float32)

    alive = np.asarray(cloud.alive)
    xyz = np.asarray(cloud.xyz)
    pidx, loc, smask, rmask, _ = query_ref(
        xyz, alive, np.asarray(grid.ranges_min),
        np.asarray(grid.scaled_vsize), grid.dims, q.max_o, q.P,
        q.query_size, q.kernel_size, raypos, SR, K,
        q.radius_limit ** 2)

    flat = pidx.reshape(R * SR, K)
    pm = flat >= 0
    safe = np.clip(flat, 0, None)
    locs = loc.reshape(R * SR, 3)

    emb = np.asarray(cloud.points_embeding)[safe]
    color = np.asarray(cloud.points_color)[safe]
    pdir = np.asarray(cloud.points_dir)[safe]
    conf = np.asarray(cloud.points_conf)[safe]
    nxyz = xyz[safe]

    def w2pers(p):
        rel = (p - campos) @ camrot
        return np.stack([rel[..., 0] / rel[..., 2],
                         rel[..., 1] / rel[..., 2], rel[..., 2]], -1)

    lp = w2pers(locs)[:, None, :]
    npers = w2pers(nxyz)
    pdist = np.stack(
        [npers[..., 0] * npers[..., 2] - lp[..., 0] * lp[..., 2],
         npers[..., 1] * npers[..., 2] - lp[..., 1] * lp[..., 2],
         npers[..., 2] - lp[..., 2]], -1)
    dists = np.concatenate([nxyz - locs[:, None, :], pdist], -1)

    w = pm / np.maximum(np.linalg.norm(dists[..., :3], axis=-1), 1e-6)
    w = w / np.maximum(w.sum(-1, keepdims=True), 1e-8)

    vd = np.repeat(raydirs, SR, axis=0)
    sigma, rgb = numpy_reference_decode(
        params, cfg.agg, emb, color, pdir, dists, w, pm, vd, np.eye(3))

    slot_ok = smask.reshape(R * SR) & pm.any(-1)
    sigma = (sigma * slot_ok).reshape(R, SR)
    rgb = rgb.reshape(R, SR, 3)

    # all step lengths clamp to vsize_z in this regime
    dist = np.full((R, SR), q.vsize[2], np.float32) * smask
    opacity = 1.0 - np.exp(-sigma * dist)
    trans = np.cumprod(1.0 - opacity + 1e-10, -1)
    trans = np.concatenate([np.ones((R, 1)), trans[:, :-1]], -1)
    blend = opacity * trans
    acc = blend.sum(-1)
    colorout = (blend[..., None] * rgb).sum(-2) + (1 - acc)[:, None] * 1.0
    ray_mask = rmask & slot_ok.reshape(R, SR).any(-1)
    colorout[~ray_mask] = 1.0
    return colorout.astype(np.float32), ray_mask


@pytest.mark.parametrize("use_cache", [False, True])
def test_render_matches_oracle_pipeline(use_cache):
    cfg, cloud, grid, params = build_scene(use_cache)
    campos = np.array([0.0, 0.0, 2.0], np.float32)
    camrot = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    raydirs = make_rays(campos, camrot, 12, 12, 14.0)
    near, far = 1.0, 3.0

    out = render_rays_jit(
        params, cloud, grid, jnp.asarray(campos), jnp.asarray(camrot),
        jnp.asarray(raydirs), jnp.asarray(near), jnp.asarray(far), cfg)
    color_jax = np.asarray(out.coarse_raycolor)
    mask_jax = np.asarray(out.ray_mask)

    color_np, mask_np = numpy_pipeline(
        cfg, cloud, grid, params, campos, camrot, raydirs, near, far)

    assert mask_jax.any()
    np.testing.assert_array_equal(mask_jax, mask_np)
    np.testing.assert_allclose(color_jax, color_np, rtol=2e-3, atol=2e-3)

"""Verify driver (see .claude/skills/verify): render + train a
synthetic sphere scene through the public API on CPU, plus a fast-path
(topk compaction / rank-gather pack / coarse windows) agreement check
covering this session's changes."""

import jax
jax.config.update("jax_platforms", "cpu")

import dataclasses
import time

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
from pointnerf2studio_tpu.models.neural_points import from_arrays
from pointnerf2studio_tpu.models.render import render_rays_jit
from pointnerf2studio_tpu.ops.grid import build_grid_from_points

t0 = time.time()
cfg = PointNerfConfig(
    query=QueryConfig(vsize=(0.02,) * 3, vscale=(2, 2, 2), SR=24, K=8,
                      P=12, max_o=200_000, z_depth_dim=120),
    agg=AggregatorConfig(),
)

rng = np.random.default_rng(0)
n = 20_000
pts = rng.normal(size=(n, 3))
pts = 0.5 * pts / np.linalg.norm(pts, axis=1, keepdims=True)
colors = (pts + 0.5).clip(0, 1)
emb = 0.1 * rng.normal(size=(n, cfg.agg.point_features_dim))
dirs = pts / np.linalg.norm(pts, axis=1, keepdims=True)
cloud = from_arrays(pts.astype(np.float32), emb.astype(np.float32),
                    np.full((n, 1), 0.8, np.float32),
                    dirs.astype(np.float32), colors.astype(np.float32))
grid = build_grid_from_points(cloud.xyz, cloud.alive, cfg.query)
print("grid dims", grid.dims, "n_occ",
      int(jnp.sum(grid.coor_occ.astype(jnp.int32))))

campos = jnp.asarray([0.0, 0.0, 2.0])
camrot = jnp.diag(jnp.asarray([1.0, -1.0, -1.0]))
H = W = 32
focal = 40.0
from pointnerf2studio_tpu.data.synthetic import camera_rays
raydirs = camera_rays(campos, camrot, H, W, focal)
near, far = jnp.asarray(1.0), jnp.asarray(3.0)

params = init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
# random init leaves the single-ReLU density head ~all-negative; bias
# it up so the scene has opacity (verify-skill recipe step 5)
params["density_head"][0]["bias"] = (
    params["density_head"][0]["bias"] + 50.0)

out = render_rays_jit(params, cloud, grid, campos, camrot, raydirs,
                      near, far, cfg)
col = np.asarray(out.coarse_raycolor).reshape(H, W, 3)
acc = np.asarray(out.acc).reshape(H, W)
mask = np.asarray(out.ray_mask).reshape(H, W)
hit = mask.mean()
print(f"render {time.time()-t0:.1f}s; hit fraction {hit:.3f}")
assert 0.3 < hit < 0.6, hit
assert np.allclose(col[0, 0], 1.0), col[0, 0]           # corner = bg
assert not np.allclose(col[H // 2, W // 2], 1.0)        # center hits
assert acc[H // 2, W // 2] > 0.3, acc[H // 2, W // 2]
sil = acc > 0.2
assert (sil == mask).all(), "silhouette != ray_mask"
print("legacy render checks OK")

# ---- fast path agreement (topk compaction + rank-gather pack) ----
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene)

fcfg = dataclasses.replace(
    cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=24,
                                   compact_budget=16, fast_chunk=2048,
                                   # 20k pts on a 0.5-radius shell is far
                                   # denser than the bench scene; lift the
                                   # cand_cap truncation AND the compact
                                   # budget (~47% of rays hit x SR=24
                                   # slots needs avg > 8 slots/ray) so
                                   # the exact-equivalence contract
                                   # applies
                                   cand_cap=256))
cache, rmin, svs = make_fast_scene(fcfg, cloud, grid, near=1.0, far=3.0)
fout = fast_render_rays_jit(params, cloud.Rw2c, cache, campos, camrot,
                            raydirs, near, far, fcfg, rmin, svs)
fm = np.asarray(fout.ray_mask).reshape(H, W)
agree = (fm == mask).mean()
fcol = np.asarray(fout.coarse_raycolor).reshape(H, W, 3)
cd = np.abs(fcol - col)[fm & mask]
print(f"fast-vs-legacy: mask agreement {agree:.4f}, "
      f"color diff max {cd.max():.4f} p99 {np.quantile(cd, 0.99):.4f} "
      f"mean {cd.mean():.5f}")
assert agree == 1.0
# bf16 attr rounding only: tiny everywhere except isolated boundary
# samples whose contribution flips (max ~0.10 on one pixel of this
# scene with BOTH the committed and reworked pack; p99 is exact)
assert np.quantile(cd, 0.99) < 0.01 and cd.mean() < 0.002, (
    cd.max(), np.quantile(cd, 0.99), cd.mean())

# coarse windows variant must match the fast baseline exactly
ccfg = dataclasses.replace(
    fcfg, query=dataclasses.replace(fcfg.query, coarse_step=8,
                                    coarse_win_budget=12))
ccache, crmin, csvs = make_fast_scene(ccfg, cloud, grid, near=1.0,
                                      far=3.0)
cout = fast_render_rays_jit(params, cloud.Rw2c, ccache, campos, camrot,
                            raydirs, near, far, ccfg, crmin, csvs)
cm = np.asarray(cout.ray_mask).reshape(H, W)
ccd = np.abs(np.asarray(cout.coarse_raycolor).reshape(H, W, 3)
             - fcol)[cm & fm]
print(f"coarse-vs-fast: mask agreement {(cm == fm).mean():.4f}, "
      f"color diff max {ccd.max():.6f}, "
      f"win_overflow {int(cout.win_overflow)}")
assert (cm == fm).all() and ccd.max() < 1e-5

# depth-window clip (slab test vs the grid box) must match the fast
# baseline exactly whenever dw_overflow == 0
from pointnerf2studio_tpu.models.fast_render import suggest_depth_window
dw = suggest_depth_window(grid.dims, fcfg.query.scaled_vsize, 1.0, 3.0,
                          fcfg.query.z_depth_dim)
dcfg = dataclasses.replace(
    fcfg, query=dataclasses.replace(fcfg.query, depth_window=dw))
dout = fast_render_rays_jit(params, cloud.Rw2c, cache, campos, camrot,
                            raydirs, near, far, dcfg, rmin, svs)
dm = np.asarray(dout.ray_mask).reshape(H, W)
dcd = np.abs(np.asarray(dout.coarse_raycolor).reshape(H, W, 3)
             - fcol)[dm & fm]
print(f"dwin-vs-fast (DW={dw}): mask agreement {(dm == fm).mean():.4f}, "
      f"color diff max {dcd.max():.6f}, "
      f"dw_overflow {int(dout.dw_overflow)}")
assert (dm == fm).all() and dcd.max() < 1e-5
assert int(dout.dw_overflow) == 0

# packed composite (segmented scans on the [M] axis) must match the
# grid composite up to f32 reduction-tree changes
pcfg = dataclasses.replace(
    fcfg, query=dataclasses.replace(fcfg.query, compact_mode="topk",
                                    composite_mode="packed"))
gcfg = dataclasses.replace(
    fcfg, query=dataclasses.replace(fcfg.query, compact_mode="topk"))
gout = fast_render_rays_jit(params, cloud.Rw2c, cache, campos, camrot,
                            raydirs, near, far, gcfg, rmin, svs)
pout = fast_render_rays_jit(params, cloud.Rw2c, cache, campos, camrot,
                            raydirs, near, far, pcfg, rmin, svs)
pm = np.asarray(pout.ray_mask)
gm = np.asarray(gout.ray_mask)
pcd = np.abs(np.asarray(pout.coarse_raycolor)
             - np.asarray(gout.coarse_raycolor))[pm & gm]
print(f"packed-vs-grid: mask agreement {(pm == gm).mean():.4f}, "
      f"color diff max {pcd.max():.7f}")
assert (pm == gm).all() and pcd.max() < 1e-5
print("fast path checks OK")

# ---- train probe: fit constant color on masked rays ----
from pointnerf2studio_tpu.train.trainer import (
    create_train_state, make_train_step)

step_fn = make_train_step(cfg)
state = create_train_state(params, cloud, cfg)
gt = jnp.ones((raydirs.shape[0], 3), jnp.float32) * jnp.asarray(
    [0.2, 0.5, 0.8])
losses = []
for s in range(30):
    state, aux = step_fn(state, grid, campos, camrot, raydirs, gt,
                         near, far, jax.random.PRNGKey(s))
    losses.append(float(aux["total"]))
print(f"train loss {losses[0]:.4f} -> {losses[-1]:.4f} "
      f"({time.time()-t0:.1f}s total)")
assert losses[-1] < losses[0] / 2, (losses[0], losses[-1])
print("VERIFY OK")

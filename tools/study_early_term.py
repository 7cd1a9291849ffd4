"""Quantify the early-ray-termination headroom on the chair scene.

The r3g clean-window rebaseline (PERF.md) puts the shipped render at
~95 ms/65k rays — at the estimated ceiling of the exact architecture,
with the per-slot chunk pipeline dominating. Classic NeRF renderers cut
that cost by dropping samples once accumulated transmittance T falls
below an epsilon (the remaining samples contribute < eps to the
pixel). The reference never terminates early (it composites all SR
slots: diff_ray_marching.py ray_march), so this would be an
opt-in *approximate* tier like ray_slot_budget — this study measures,
on CPU at real chair-scene statistics:

  * the fraction of valid (decoded) slots that sit BEHIND the point
    where T < eps on their ray, for eps in {1e-2, 1e-3, 1e-4} — the
    slot-count saving an exact-prefix wave decoder could harvest;
  * the max |color delta| incurred by zeroing those slots' weights —
    the exactness cost (bounded by eps per channel in theory).

Pure analysis: renders nothing on the TPU, changes no shipped path.
Usage: python tools/study_early_term.py [n_rays] [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.data.synthetic import camera_rays, make_chair_scene
from pointnerf2studio_tpu.models.fast_render import (
    chunk_pipeline, make_fast_scene)
from pointnerf2studio_tpu.ops.select import (
    rank_gather_pack, select_first_cols)
from tools.probe_bench_variants import base_cfg


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 558_000
    cfg = base_cfg(fast_chunk=4096, compact_mode="topk",
                   composite_mode="packed")
    q = cfg.query
    t0 = time.time()
    scene = make_chair_scene(n_points=n_points, cfg=cfg)
    cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid,
                                       near=scene.near, far=scene.far)
    D = q.z_depth_dim
    near, far = float(scene.near), float(scene.far)
    step_t = (far - near) / D
    dims = cache.coor_2_qslot.shape
    gy, gz = dims[1], dims[2]
    dims_arr = jnp.array(dims, jnp.int32)
    qslot_flat = cache.coor_2_qslot.reshape(-1)
    M = R * q.compact_budget

    # reference pixel sampling of the 800x800 chair frame
    frame = camera_rays(scene.campos, scene.camrotc2w, 800, 800, 1111.1)
    idx = np.random.default_rng(0).choice(frame.shape[0], R, replace=False)
    rays = jnp.asarray(np.asarray(frame)[idx])

    @jax.jit
    def frontend(rays):
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos = scene.campos + rays[:, None, :] * t_mid[None, :, None]
        gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        qs = jnp.where(inb, qslot_flat[jnp.where(inb, fidx, 0)], -1)
        col_sel, cnt, _ = select_first_cols(
            qs, q.ray_slot_budget, min(q.SR, q.ray_slot_budget, D),
            q.select_mode)
        return rank_gather_pack(qs, col_sel, cnt, M)

    sel_ray, _slot, sel_d, _sel, qslot_c, mask_c = frontend(rays)
    print(f"setup {time.time()-t0:.0f}s; valid slots "
          f"{int(mask_c.sum())} of {M}", flush=True)

    sig, rgb, found, _pb = chunk_pipeline(
        scene.params, scene.cloud.Rw2c, cache, rays, scene.campos,
        scene.camrotc2w, jnp.asarray(near), jnp.asarray(step_t), cfg,
        rmin, svs, qslot_c, sel_ray, sel_d, mask_c)
    sig = np.asarray(sig, np.float64)
    rgb = np.asarray(rgb, np.float64)
    msk = np.asarray(mask_c)
    sray = np.asarray(sel_ray)
    sd = np.asarray(sel_d)
    print(f"decoded (+{time.time()-t0:.0f}s)", flush=True)

    # per-ray front-to-back composite in float64 (packed order is
    # ray-major, depth-ascending within a ray — verify then composite)
    order = np.lexsort((sd, sray))
    v = msk[order]
    sray_o, sd_o, sig_o, rgb_o = (sray[order][v], sd[order][v],
                                  sig[order][v], rgb[order][v])
    # ray-marching dist: step_t * |ray| (rays here are unit-normalized
    # pinhole dirs scaled per camera_rays; match compositing defaults)
    dist = step_t
    opa = 1.0 - np.exp(-np.maximum(sig_o, 0.0) * dist)
    ray_ids, starts = np.unique(sray_o, return_index=True)
    ends = np.append(starts[1:], sray_o.size)
    n_slots = v.sum()
    behind = {1e-2: 0, 1e-3: 0, 1e-4: 0}
    col_delta = {1e-2: 0.0, 1e-3: 0.0, 1e-4: 0.0}
    slots_per_ray = []
    for s, e in zip(starts, ends):
        o = opa[s:e]
        w_t = np.concatenate([[1.0], np.cumprod(1.0 - o + 1e-10)[:-1]])
        w = o * w_t
        cfull = (w[:, None] * rgb_o[s:e]).sum(0)
        slots_per_ray.append(e - s)
        for eps in behind:
            cut = np.argmax(w_t < eps) if (w_t < eps).any() else e - s
            behind[eps] += (e - s) - cut
            ccut = (w[:cut, None] * rgb_o[s:e][:cut]).sum(0)
            col_delta[eps] = max(col_delta[eps],
                                 float(np.abs(cfull - ccut).max()))

    tot = int(n_slots)
    print(f"rays with slots: {len(starts)} of {R}; "
          f"slots/ray mean {np.mean(slots_per_ray):.1f} "
          f"p50 {np.percentile(slots_per_ray, 50):.0f} "
          f"p99 {np.percentile(slots_per_ray, 99):.0f}")
    for eps in (1e-2, 1e-3, 1e-4):
        print(f"eps={eps:g}: {behind[eps]} of {tot} valid slots behind "
              f"T<eps ({100.0 * behind[eps] / tot:.1f}% saving); "
              f"max color delta {col_delta[eps]:.2e}")

    # ---- K-validity occupancy: what fraction of the [M, K] MLP-tower
    # rows are padding (pnt_mask False on a valid slot)? An EXACT
    # (slot, K)-axis compaction would save that fraction of the tower.
    from pointnerf2studio_tpu.models.fast_train import (
        fast_train_render, make_geo_scene)
    geo, g_rmin, g_svs = make_geo_scene(cfg, scene.cloud, scene.grid)
    out = fast_train_render(
        scene.params, scene.cloud, geo, scene.campos, scene.camrotc2w,
        rays, jnp.asarray(near), jnp.asarray(far), cfg, g_rmin, g_svs,
        key=jax.random.PRNGKey(0), training=False)
    pm = np.asarray(out.pnt_mask)                        # [M, K]
    slot_valid = pm.any(-1)
    kcnt = pm[slot_valid].sum(-1)
    print(f"K-validity over {int(slot_valid.sum())} valid slots "
          f"(K={pm.shape[1]}): mean {kcnt.mean():.2f} "
          f"p50 {np.percentile(kcnt, 50):.0f} "
          f"p90 {np.percentile(kcnt, 90):.0f}; "
          f"tower-row padding {100.0 * (1 - kcnt.mean() / pm.shape[1]):.1f}%")


if __name__ == "__main__":
    main()

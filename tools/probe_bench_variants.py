"""End-to-end fast-path throughput across config variants (the only
trustworthy methodology here): compact_budget, fast_chunk, extract
ablation. One scene build, several jitted variants."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays, make_fast_scene)


def base_cfg(agg_kw=None, **qkw):
    kw = dict(
        vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
        SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
        compact_budget=8, ray_slot_budget=32, use_cache=False)
    kw.update(qkw)
    return PointNerfConfig(
        query=QueryConfig(**kw),
        agg=AggregatorConfig(compute_dtype="bfloat16", **(agg_kw or {})),
    )


def resolve_measured_sentinels(cfg_v, scene, rays):
    """depth_window == -2 / ray_budget == -2 mean: size from this ray
    set (measured_depth_window / slab_hit_mask + 3% slack)."""
    q = cfg_v.query
    if q.depth_window == -2:
        from pointnerf2studio_tpu.models.fast_render import (
            measured_depth_window)
        dw = measured_depth_window(
            scene.campos, np.asarray(rays), scene.near, scene.far,
            q.z_depth_dim, scene.grid.ranges_min, scene.grid.dims,
            q.scaled_vsize)
        print(f"measured dw {dw} of D {q.z_depth_dim}", flush=True)
        cfg_v = dataclasses.replace(cfg_v, query=dataclasses.replace(
            cfg_v.query, depth_window=dw))
        q = cfg_v.query
    if q.span_tiers == (-2,):
        from pointnerf2studio_tpu.models.fast_render import (
            measured_span_tiers)
        widths, budgets = measured_span_tiers(
            scene.campos, np.asarray(rays), scene.near, scene.far,
            q.z_depth_dim, scene.grid.ranges_min, scene.grid.dims,
            q.scaled_vsize)
        print(f"measured span tiers {widths} budgets {budgets} "
              f"(rows {sum(w * b for w, b in zip(widths, budgets))} "
              f"vs flat {max(widths) * sum(budgets)})", flush=True)
        cfg_v = dataclasses.replace(cfg_v, query=dataclasses.replace(
            cfg_v.query, span_tiers=widths, span_tier_budgets=budgets))
        q = cfg_v.query
    if q.ray_budget == -2:
        from pointnerf2studio_tpu.models.fast_render import slab_hit_mask
        hits = int(slab_hit_mask(
            scene.campos, np.asarray(rays), scene.near, scene.far,
            q.z_depth_dim, scene.grid.ranges_min, scene.grid.dims,
            q.scaled_vsize).sum())
        rb = min(rays.shape[0],
                 (int(hits * 1.03) + 1023) // 1024 * 1024)
        print(f"measured rb {rb} of R {rays.shape[0]} (hits {hits})",
              flush=True)
        cfg_v = dataclasses.replace(cfg_v, query=dataclasses.replace(
            cfg_v.query, ray_budget=rb))
        q = cfg_v.query
    if q.march_steps == (-2,):
        # plan the staged march from an occupancy-only table (planning
        # needs occupancy + distances, not qslot ids); the rb-packed
        # ray count bounds the simulated set when rb is on
        import jax.numpy as jnp

        from pointnerf2studio_tpu.ops.march import (
            build_march_table, plan_march)
        occ = jnp.asarray(scene.grid.coor_occ)
        tbl = np.asarray(build_march_table(
            jnp.where(occ.astype(bool), 0, -1)))
        cap = min(q.SR, q.ray_slot_budget or min(q.SR, 32),
                  q.z_depth_dim)
        steps, buckets = plan_march(
            tbl, scene.grid.ranges_min, q.scaled_vsize, scene.campos,
            np.asarray(rays), float(scene.near), float(scene.far),
            q.z_depth_dim, cap,
            stages=int(os.environ.get("PROBE_MARCH_STAGES", "4")))
        print(f"measured march steps {steps} buckets {buckets}",
              flush=True)
        cfg_v = dataclasses.replace(cfg_v, query=dataclasses.replace(
            cfg_v.query, march_steps=steps, march_buckets=buckets))
    return cfg_v


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "b8"
    tag, cfg_v, ab = VARIANTS[which]
    cfg0 = cfg_v   # cache must match the variant (coarse_occ presence)
    use_chair = os.environ.get("PROBE_SCENE", "") == "chair"
    t0 = time.time()
    if use_chair:
        # chair-shaped cloud at the reference chair's exact geometry:
        # near/far [2, 6], 400 samples (dev_scripts/w_n360/chair_points.sh
        # density), 800x800-equivalent focal
        import dataclasses as _dc

        from pointnerf2studio_tpu.data.synthetic import make_chair_scene
        cfg0 = _dc.replace(cfg0, query=_dc.replace(
            cfg0.query, z_depth_dim=400))
        cfg_v = cfg0
        tag = tag + " CHAIR"
        scene = make_chair_scene(n_points=558_000, cfg=cfg0)
    else:
        scene = make_sphere_scene(n_points=558_000, cfg=cfg0)
    if which.endswith("hash"):
        # sparse front-end: same rows, qslot lookups via the bucket
        # table (ops/hash_grid.py) — times the hash lookup vs the
        # dense table gather at bench scale
        from pointnerf2studio_tpu.models.fast_render import (
            make_hash_fast_scene)
        from pointnerf2studio_tpu.ops.hash_grid import (
            build_hash_grid_from_points)
        hgr = build_hash_grid_from_points(
            scene.cloud.xyz, scene.cloud.alive, cfg0.query)
        print(f"hash grid: B={hgr.n_buckets} S={hgr.bucket_slots} "
              f"n_q={int(hgr.n_q)}", flush=True)
        cache, rmin, svs = make_hash_fast_scene(cfg0, scene.cloud, hgr)
    else:
        cache, rmin, svs = make_fast_scene(cfg0, scene.cloud, scene.grid,
                                           near=scene.near, far=scene.far,
                                           params=scene.params)
    jax.block_until_ready(
        cache.kpay if cache.kpay is not None else cache.rows)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    R = 65536
    if os.environ.get("PROBE_RAYS", "") == "shuffle" and use_chair:
        # exactly the shipped bench's ray distribution: a fixed-perm
        # shuffle of the FULL 800x800 frame, first chunk — random
        # directions (no image-space locality), unlike the coherent
        # 256x256 tile below. Measures whether gather locality explains
        # a bench-vs-probe throughput gap.
        frame = camera_rays(scene.campos, scene.camrotc2w, 800, 800,
                            1111.1)
        perm = np.random.default_rng(0).permutation(frame.shape[0])
        rd0 = jnp.asarray(np.asarray(jax.device_get(frame))[perm[:R]])
        tag = tag + " SHUF"
    else:
        rd0 = (camera_rays(scene.campos, scene.camrotc2w, 256, 256,
                           355.5)
               if use_chair else
               camera_rays(scene.campos, scene.camrotc2w, 128, 512,
                           320.0))
    # 9 DISTINCT ray buffers (8 timed + 1 warmup): block_until_ready is
    # a no-op on this backend (probe_backend_semantics.py), so timing
    # relies on unique inputs + one dependent scalar fetch at the end
    ray_vars = []
    for i in range(9):
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]))
    near, far = jnp.asarray(scene.near), jnp.asarray(scene.far)

    cfg_v = resolve_measured_sentinels(cfg_v, scene, ray_vars[0])

    def run(tag, cfg, ablate=None):
        from tools.timing import timed_scalar_calls

        @jax.jit
        def f(params, Rw2c, cache, raydirs):
            out = fast_render_rays(
                params, Rw2c, cache, scene.campos, scene.camrotc2w,
                raydirs, near, far, cfg, rmin, svs,
                debug_ablate=ablate).coarse_raycolor
            # scalar reduce INSIDE the program: the end-of-loop fetch
            # depends on every call; a separate out-of-jit .sum()
            # would compile a second program (~1s remote) mid-timing
            return out.astype(jnp.float32).sum()
        try:
            from tools.timing import congestion_sentinel
            s_pre = congestion_sentinel()
            dt, tot = timed_scalar_calls(
                lambda r: f(scene.params, scene.cloud.Rw2c, cache, r),
                ray_vars[:8], warmup_input=ray_vars[8])
            s_post = congestion_sentinel()
            print(f"{tag:28}: {dt*1e3:7.1f} ms -> {R/dt:,.0f} rays/s"
                  f"  (sum {tot:.1f}; incl ~30ms fetch /8; "
                  f"sentinel {s_pre:.1f}/{s_post:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{tag:28}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    if which == "null":
        # fetch-overhead calibration: a trivial program timed with the
        # same harness — its per-call time is pure dispatch + the
        # amortized end fetch, inflating every variant equally
        from tools.timing import timed_scalar_calls

        @jax.jit
        def g(r):
            return r.astype(jnp.float32).sum()

        dt, _ = timed_scalar_calls(g, ray_vars[:8],
                                   warmup_input=ray_vars[8])
        print(f"null dispatch+fetch        : {dt*1e3:7.1f} ms",
              flush=True)
        return
    run(tag, cfg_v, ablate=ab)


# this backend reports phantom ~0ms times after a few distinct
# programs in one process — run ONE variant per process
VARIANTS = {
    "null": ("null dispatch", base_cfg(fast_chunk=4096), None),
    "b8": ("budget=8 ch=64k", base_cfg(), None),
    "b6": ("budget=6 ch=64k", base_cfg(compact_budget=6), None),
    "b5": ("budget=5 ch=64k", base_cfg(compact_budget=5), None),
    "b6c96": ("budget=6 ch=96k",
              base_cfg(compact_budget=6, fast_chunk=98304), None),
    "b6c33": ("budget=6 ch=33k",
              base_cfg(compact_budget=6, fast_chunk=32768), None),
    "b6xs": ("budget=6 extract-skip", base_cfg(compact_budget=6),
             "extract"),
    "b6ds": ("budget=6 decode-skip", base_cfg(compact_budget=6),
             "decode"),
    "b6qs": ("budget=6 qslot-skip", base_cfg(compact_budget=6),
             "qslot"),
    "b6ks": ("budget=6 knn-skip", base_cfg(compact_budget=6),
             "knn"),
    # ---- round 2: the r1 best is budget=8 slot_budget=32 ch=4096 ----
    "c4k": ("b8 ch=4096 (r1 best)", base_cfg(fast_chunk=4096), None),
    "c2k": ("b8 ch=2048", base_cfg(fast_chunk=2048), None),
    "c3k": ("b8 ch=3072", base_cfg(fast_chunk=3072), None),
    "c6k": ("b8 ch=6144", base_cfg(fast_chunk=6144), None),
    # qslot-stage ablation at the r1-best chunking: remaining headroom
    "c4kqs": ("b8 ch=4096 qslot-skip", base_cfg(fast_chunk=4096),
              "qslot"),
    "c4kds": ("b8 ch=4096 decode-skip", base_cfg(fast_chunk=4096),
              "decode"),
    # K-accumulating Pallas decode (fused_decode2) at the r1-best chunking
    "f2": ("b8 ch=4096 fused2",
           PointNerfConfig(
               query=QueryConfig(
                   vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
                   SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
                   compact_budget=8, ray_slot_budget=32, use_cache=False,
                   fast_chunk=4096),
               agg=AggregatorConfig(compute_dtype="bfloat16",
                                    fused_decode2=True)), None),
    "f2c8": ("b8 ch=8192 fused2",
             PointNerfConfig(
                 query=QueryConfig(
                     vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
                     SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
                     compact_budget=8, ray_slot_budget=32, use_cache=False,
                     fast_chunk=8192),
                 agg=AggregatorConfig(compute_dtype="bfloat16",
                                      fused_decode2=True)), None),
    "f2c16": ("b8 ch=16384 fused2",
              PointNerfConfig(
                  query=QueryConfig(
                      vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
                      SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
                      compact_budget=8, ray_slot_budget=32,
                      use_cache=False, fast_chunk=16384),
                  agg=AggregatorConfig(compute_dtype="bfloat16",
                                       fused_decode2=True)), None),
    # two-level sample masking retry at small chunks
    "co4": ("b8 ch=4096 coarse S=4",
            base_cfg(fast_chunk=4096, coarse_step=4,
                     coarse_win_budget=12, coarse_win_global=6), None),
    "co6": ("b8 ch=4096 coarse S=6",
            base_cfg(fast_chunk=4096, coarse_step=6,
                     coarse_win_budget=10, coarse_win_global=5), None),
    "co8": ("b8 ch=4096 coarse S=8",
            base_cfg(fast_chunk=4096, coarse_step=8,
                     coarse_win_budget=8, coarse_win_global=4), None),
    "co4w": ("b8 ch=4096 coarse S=4 w16/8",
             base_cfg(fast_chunk=4096, coarse_step=4,
                      coarse_win_budget=16, coarse_win_global=8), None),
    "co8w": ("b8 ch=4096 coarse S=8 w16/8",
             base_cfg(fast_chunk=4096, coarse_step=8,
                      coarse_win_budget=16, coarse_win_global=8), None),
    "co8w12": ("b8 ch=4096 coarse S=8 w12/6",
               base_cfg(fast_chunk=4096, coarse_step=8,
                        coarse_win_budget=12, coarse_win_global=6), None),
    "co8wcc32": ("b8 ch=4096 coarse S=8 w16/8 cand=32",
                 base_cfg(fast_chunk=4096, coarse_step=8,
                          coarse_win_budget=16, coarse_win_global=8,
                          cand_cap=32), None),
    "co12": ("b8 ch=4096 coarse S=12",
             base_cfg(fast_chunk=4096, coarse_step=12,
                      coarse_win_budget=7, coarse_win_global=4), None),
    "co16": ("b8 ch=4096 coarse S=16",
             base_cfg(fast_chunk=4096, coarse_step=16,
                      coarse_win_budget=6, coarse_win_global=3), None),
    # stage ablations at the r1-best chunking (c4kqs/c4kds above)
    "c4kcs": ("b8 ch=4096 compact-skip", base_cfg(fast_chunk=4096),
              "compact"),
    "tk": ("b8 ch=4096 topk-compact",
           base_cfg(fast_chunk=4096, compact_mode="topk"), None),
    "oh": ("b8 ch=4096 onehot-compact",
           base_cfg(fast_chunk=4096, compact_mode="onehot"), None),
    "ps": ("b8 ch=4096 pallas-select",
           base_cfg(fast_chunk=4096, select_mode="pallas"), None),
    "psco8": ("b8 ch=4096 pallas-select coarse S=8",
              base_cfg(fast_chunk=4096, select_mode="pallas",
                       coarse_step=8, coarse_win_budget=8), None),
    "tkco8": ("b8 ch=4096 topk-select coarse S=8",
              base_cfg(fast_chunk=4096, coarse_step=8,
                       coarse_win_budget=8), None),
    "tkco8w12": ("b8 ch=4096 topk-select coarse S=8 BW=12",
                 base_cfg(fast_chunk=4096, coarse_step=8,
                          coarse_win_budget=12), None),
    "tkqs": ("b8 ch=4096 topk qslot-skip",
             base_cfg(fast_chunk=4096, compact_mode="topk"), "qslot"),
    "tkpc": ("b8 ch=4096 topk packed-composite",
             base_cfg(fast_chunk=4096, compact_mode="topk",
                      composite_mode="packed"), None),
    "tkpcco8": ("b8 ch=4096 topk packed-composite coarse S=8",
                base_cfg(fast_chunk=4096, compact_mode="topk",
                         composite_mode="packed", coarse_step=8,
                         coarse_win_budget=8), None),
    "tkpcco8w12": ("b8 ch=4096 topk packed coarse S=8 BW=12",
                   base_cfg(fast_chunk=4096, compact_mode="topk",
                            composite_mode="packed", coarse_step=8,
                            coarse_win_budget=12), None),
    "tkpcco8w16": ("b8 ch=4096 topk packed coarse S=8 BW=16",
                   base_cfg(fast_chunk=4096, compact_mode="topk",
                            composite_mode="packed", coarse_step=8,
                            coarse_win_budget=16), None),
    # small-S coarse windows: dilation L=ceil((S-1)/2 * dt/vox) shrinks
    # with S (S=4 -> L=2, S=2 -> L=1 vs S=8 -> L=5), so the positive-
    # window inflation and the BW overflow pressure drop
    "tkpcco4w8": ("b8 ch=4096 topk packed coarse S=4 BW=8",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", coarse_step=4,
                           coarse_win_budget=8), None),
    "tkpcco4w12": ("b8 ch=4096 topk packed coarse S=4 BW=12",
                   base_cfg(fast_chunk=4096, compact_mode="topk",
                            composite_mode="packed", coarse_step=4,
                            coarse_win_budget=12), None),
    "tkpcco2w12": ("b8 ch=4096 topk packed coarse S=2 BW=12",
                   base_cfg(fast_chunk=4096, compact_mode="topk",
                            composite_mode="packed", coarse_step=2,
                            coarse_win_budget=12), None),
    # per-ray depth-window clip (slab test vs the grid box): fewer
    # table-gather rows with a dw_overflow exactness counter
    "tkpcdw128": ("b8 ch=4096 topk packed dw=128",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", depth_window=128),
                  None),
    "tkpcdw144": ("b8 ch=4096 topk packed dw=144",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", depth_window=144),
                  None),
    "tkpcdw112": ("b8 ch=4096 topk packed dw=112",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", depth_window=112),
                  None),
    "tkpcdwm": ("b8 ch=4096 topk packed dw=measured",
                base_cfg(fast_chunk=4096, compact_mode="topk",
                         composite_mode="packed", depth_window=-2),
                None),
    # coarse windows composed with the per-ray depth window + packing
    "tkpcco2dwrbm": ("b8 ch=4096 topk packed coarse S=2 BW=16 dw+rb",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed", coarse_step=2,
                              coarse_win_budget=16, depth_window=-2,
                              ray_budget=-2), None),
    "tkpcco4dwrbm": ("b8 ch=4096 topk packed coarse S=4 BW=12 dw+rb",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed", coarse_step=4,
                              coarse_win_budget=12, depth_window=-2,
                              ray_budget=-2), None),
    "tkfs": ("b8 ch=4096 topk packed fused-select",
             base_cfg(fast_chunk=4096, compact_mode="topk",
                      composite_mode="packed", knn_mode="fused"),
             None),
    "tkfsdwrbm": ("b8 ch=4096 topk packed fused-select dw+rb",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", knn_mode="fused",
                           depth_window=-2, ray_budget=-2),
                  None),
    "tkpcrbm": ("b8 ch=4096 topk packed rb=measured",
                base_cfg(fast_chunk=4096, compact_mode="topk",
                         composite_mode="packed", ray_budget=-2),
                None),
    # distance-field ray march front-end (ops/march.py), plan measured
    "tkpcmcm": ("b8 ch=4096 topk packed march measured",
                base_cfg(fast_chunk=4096, compact_mode="topk",
                         composite_mode="packed", march_steps=(-2,)),
                None),
    "tkpcmcmrbm": ("b8 ch=4096 topk packed march+rb measured",
                   base_cfg(fast_chunk=4096, compact_mode="topk",
                            composite_mode="packed", march_steps=(-2,),
                            ray_budget=-2),
                   None),
    # cand_cap pricing under the SHIPPED march+rb config: how much of
    # the chunk pipeline (gather width / [Mc, C] geometry / extract
    # einsum width) scales with the candidate width C. cc32 is a
    # PRICING probe (~0.003% rays deviated at 32 in r2 — check
    # exactness before adopting); if C=32/16 saves real ms, the exact
    # per-voxel candidate-reduction build (keep only candidates that
    # can be a K-NN for SOME position in the voxel) is worth building.
    "tkpcmcmrbmcc32": ("b8 ch=4096 topk packed march+rb cand=32",
                       base_cfg(fast_chunk=4096, compact_mode="topk",
                                composite_mode="packed",
                                march_steps=(-2,), ray_budget=-2,
                                cand_cap=32),
                       None),
    "tkpcmcmrbmcc16": ("b8 ch=4096 topk packed march+rb cand=16",
                       base_cfg(fast_chunk=4096, compact_mode="topk",
                                composite_mode="packed",
                                march_steps=(-2,), ray_budget=-2,
                                cand_cap=16),
                       None),
    # EXACT candidate reduction (QueryConfig.cand_prune): stored width
    # = max kept after the provably-safe prune; selection bit-exact vs
    # the unpruned cache (tests/test_fast_render.py)
    "tkpcmcmrbmcp": ("b8 ch=4096 topk packed march+rb cand_prune",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed",
                              march_steps=(-2,), ray_budget=-2,
                              cand_prune=True),
                     None),
    "tkpcbhmcmrbm": ("b8 ch=4096 topk packed base_h march+rb",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed", march_steps=(-2,),
                              ray_budget=-2, base_cache=True),
                     None),
    # krows extract restructure (QueryConfig.extract_mode="krows"):
    # slim 12 B/candidate selection gather + direct K-row payload
    # gather — drops ~4x of gather bytes and the extract einsum;
    # bit-identical values on CPU (tests/test_fast_render.py).
    # CHIP STATUS (r3h, /tmp/queue_r3h.log): the TPU backend compiler
    # CRASHES on this program (remote_compile HTTP 500,
    # tpu_compile_helper exit 1) for both tkkrmcmrbm and
    # tkkrbhpemcmrbm — suspect the f32->bf16 bitcast-of-slice
    # (trailing-dim-2 insert + reshape) or the [max_q*C, ROWW]
    # flat-view gather; do not queue again until the kernel is
    # restructured around whichever op reproduces the crash.
    "tkkrmcmrbm": ("b8 ch=4096 topk packed krows march+rb",
                   base_cfg(fast_chunk=4096, compact_mode="topk",
                            composite_mode="packed", march_steps=(-2,),
                            ray_budget=-2, extract_mode="krows"),
                   None),
    "tkkrpemcmrbm": ("b8 ch=4096 topk packed krows pe-rec march+rb",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed", march_steps=(-2,),
                              ray_budget=-2, extract_mode="krows",
                              agg_kw=dict(pe_mode="rec")),
                     None),
    "tkkrbhpemcmrbm": ("b8 ch=4096 krows base_h pe-rec march+rb",
                       base_cfg(fast_chunk=4096, compact_mode="topk",
                                composite_mode="packed",
                                march_steps=(-2,), ray_budget=-2,
                                extract_mode="krows", base_cache=True,
                                agg_kw=dict(pe_mode="rec")),
                       None),
    # Valid-pair-packed decode tail (QueryConfig.decode_mode="pair"):
    # the per-neighbor tower runs on a dense [Mc * pair_budget] pair
    # packing instead of the [Mc, K] padded lanes; the one-hot extract
    # einsum becomes one [MP]-row payload gather. Bench statistics:
    # mean 6.2 of K=8 lanes valid (tools/study_early_term.py), so
    # budget 7 saves ~12% of the per-pair rows exact-with-counter and
    # budget 8 isolates the extract-replacement effect.
    "tkpcprmcmrbm": ("b8 ch=4096 topk packed pair7 march+rb",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed", march_steps=(-2,),
                              ray_budget=-2, decode_mode="pair",
                              pair_budget=7),
                     None),
    "tkpcpr8mcmrbm": ("b8 ch=4096 topk packed pair8 march+rb",
                      base_cfg(fast_chunk=4096, compact_mode="topk",
                               composite_mode="packed",
                               march_steps=(-2,), ray_budget=-2,
                               decode_mode="pair", pair_budget=8),
                      None),
    "tkkrprmcmrbm": ("b8 ch=4096 topk packed krows+pair7 march+rb",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed", march_steps=(-2,),
                              ray_budget=-2, extract_mode="krows",
                              decode_mode="pair", pair_budget=7),
                     None),
    "tkpcbhprmcmrbm": ("b8 ch=4096 topk packed base_h+pair7 march+rb",
                       base_cfg(fast_chunk=4096, compact_mode="topk",
                                composite_mode="packed",
                                march_steps=(-2,), ray_budget=-2,
                                base_cache=True, decode_mode="pair",
                                pair_budget=7),
                       None),
    # PE angle-doubling recurrence (AggregatorConfig.pe_mode="rec"):
    # trades per-octave sin polynomials for 3 multiplies — attacks the
    # PE share of the compute-spread chunk cost (PERF.md r3e)
    "tkpcpemcmrbm": ("b8 ch=4096 topk packed pe-rec march+rb",
                     base_cfg(fast_chunk=4096, compact_mode="topk",
                              composite_mode="packed", march_steps=(-2,),
                              ray_budget=-2,
                              agg_kw=dict(pe_mode="rec")),
                     None),
    # base_h cache (kills PE(emb)) + pe-rec (cheapens PE(dists)): the
    # two PE levers composed
    "tkpcbhpemcmrbm": ("b8 ch=4096 topk packed base_h pe-rec march+rb",
                       base_cfg(fast_chunk=4096, compact_mode="topk",
                                composite_mode="packed",
                                march_steps=(-2,), ray_budget=-2,
                                base_cache=True,
                                agg_kw=dict(pe_mode="rec")),
                       None),
    "tkpcdwrbm": ("b8 ch=4096 topk packed dw+rb measured",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", depth_window=-2,
                           ray_budget=-2),
                  None),
    # fully-fused chunk pipeline (ops/fused_chunk.py): ONE Pallas VMEM
    # pass for select+extract+dists+weights+decode; masks exact,
    # colors to bf16 tolerance (check_variant_exact TOLS)
    "tkfcmcm": ("b8 ch=4096 fused-chunk march measured",
                base_cfg(fast_chunk=4096, compact_mode="topk",
                         composite_mode="packed", chunk_mode="fused",
                         march_steps=(-2,)),
                None),
    "tkfcmcmrbm": ("b8 ch=4096 fused-chunk march+rb measured",
                   base_cfg(fast_chunk=4096, compact_mode="topk",
                            composite_mode="packed", chunk_mode="fused",
                            march_steps=(-2,), ray_budget=-2),
                   None),
    "tkfcb1kmcmrbm": ("b8 ch=4096 fused-chunk block=1024 march+rb",
                      base_cfg(fast_chunk=4096, compact_mode="topk",
                               composite_mode="packed",
                               chunk_mode="fused", fused_chunk_block=1024,
                               march_steps=(-2,), ray_budget=-2),
                      None),
    # chunk-size lever at the shipped dw+rb config: if the downstream
    # cost is per-chunk-iteration overhead (flat single-stage skips,
    # ~2.6 ms/active chunk), doubling CH halves it. Bounded above by
    # the v5e >=512k-row MLP regalloc bug (STATUS.md) — 32k chunks of
    # K=8 rows = 262k MLP rows stays under it.
    "tkpcdwrbm8k": ("b8 ch=8192 topk packed dw+rb measured",
                    base_cfg(fast_chunk=8192, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2),
                    None),
    "tkpcdwrbm16k": ("b8 ch=16384 topk packed dw+rb measured",
                     base_cfg(fast_chunk=16384, compact_mode="topk",
                              composite_mode="packed", depth_window=-2,
                              ray_budget=-2),
                     None),
    "tkpcdwrbm32k": ("b8 ch=32768 topk packed dw+rb measured",
                     base_cfg(fast_chunk=32768, compact_mode="topk",
                              composite_mode="packed", depth_window=-2,
                              ray_budget=-2),
                     None),
    # pack/M-scaling lever composed with dw+rb (PERF.md item 3):
    # rb already shrinks M via R; budget 5/6 shrinks it further
    "tkpcb6dwrbm": ("b6 ch=4096 topk packed dw+rb measured",
                    base_cfg(fast_chunk=4096, compact_budget=6,
                             compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2),
                    None),
    # stage attribution AT the shipped dw+rb config (the chair bench
    # path): full - <skip> = that stage's cost at 159.6 ms scale
    "tkpcdwrbmcs": ("b8 ch=4096 dw+rb compact-skip",
                    base_cfg(fast_chunk=4096, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2), "compact"),
    "tkpcdwrbmds": ("b8 ch=4096 dw+rb decode-skip",
                    base_cfg(fast_chunk=4096, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2), "decode"),
    "tkpcdwrbmws": ("b8 ch=4096 dw+rb weights-skip",
                    base_cfg(fast_chunk=4096, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2), "weights"),
    "tkpcdwrbmxs": ("b8 ch=4096 dw+rb extract-skip",
                    base_cfg(fast_chunk=4096, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2), "extract"),
    "tkpcdwrbmgs": ("b8 ch=4096 dw+rb gather-skip",
                    base_cfg(fast_chunk=4096, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2), "gather"),
    "tkpcdwrbmks": ("b8 ch=4096 dw+rb knn-skip",
                    base_cfg(fast_chunk=4096, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2), "knn"),
    "tkpcdwrbmss": ("b8 ch=4096 dw+rb sel-only-skip",
                    base_cfg(fast_chunk=4096, compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2), "selonly"),
    "tkpcstm": ("b8 ch=4096 topk packed span-tiers measured",
                base_cfg(fast_chunk=4096, compact_mode="topk",
                         composite_mode="packed", span_tiers=(-2,)),
                None),
    "tkpcb6stm": ("b6 ch=4096 topk packed span-tiers measured",
                  base_cfg(fast_chunk=4096, compact_budget=6,
                           compact_mode="topk",
                           composite_mode="packed", span_tiers=(-2,)),
                  None),
    "tkpcb5dwrbm": ("b5 ch=4096 topk packed dw+rb measured",
                    base_cfg(fast_chunk=4096, compact_budget=5,
                             compact_mode="topk",
                             composite_mode="packed", depth_window=-2,
                             ray_budget=-2),
                    None),
    # chair-geometry windows (D=400; box-diagonal chord bound ~288)
    "tkpcdw240": ("b8 ch=4096 topk packed dw=240",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", depth_window=240),
                  None),
    "tkpcdw288": ("b8 ch=4096 topk packed dw=288",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", depth_window=288),
                  None),
    # sparse front-end timing (cache built by the which.endswith("hash")
    # branch in main(); cfg must avoid dense-only features)
    "tkpchash": ("b8 ch=4096 topk packed HASH front-end",
                 base_cfg(fast_chunk=4096, compact_mode="topk",
                          composite_mode="packed"),
                 None),
    "tkpcdwrbmhash": ("b8 ch=4096 topk packed dw+rb HASH",
                      base_cfg(fast_chunk=4096, compact_mode="topk",
                               composite_mode="packed", depth_window=-2,
                               ray_budget=-2),
                      None),
    "tksb": ("b8 ch=4096 topk scatterback-skip",
             base_cfg(fast_chunk=4096, compact_mode="topk"),
             "scatterback"),
    "tkks": ("b8 ch=4096 topk knn-skip",
             base_cfg(fast_chunk=4096, compact_mode="topk"), "knn"),
    "tkxs": ("b8 ch=4096 topk extract-skip",
             base_cfg(fast_chunk=4096, compact_mode="topk"), "extract"),
    "tkds": ("b8 ch=4096 topk decode-skip",
             base_cfg(fast_chunk=4096, compact_mode="topk"), "decode"),
    "tkpcchair": ("b8 ch=4096 topk packed",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed"), None),
    "tkxg": ("b8 ch=4096 topk extract-gather",
             base_cfg(fast_chunk=4096, compact_mode="topk",
                      extract_mode="gather"), None),
    "tkpcco16": ("b8 ch=4096 topk packed coarse S=16 BW=4",
                 base_cfg(fast_chunk=4096, compact_mode="topk",
                          composite_mode="packed", coarse_step=16,
                          coarse_win_budget=4), None),
    "tkpcco8b6": ("b8 ch=4096 topk packed coarse S=8 BW=6",
                  base_cfg(fast_chunk=4096, compact_mode="topk",
                           composite_mode="packed", coarse_step=8,
                           coarse_win_budget=6), None),
    "tkss": ("b8 ch=4096 topk sel-skip",
             base_cfg(fast_chunk=4096, compact_mode="topk"), "selonly"),
    # topk+packed (r2 best-exact) secondary sweeps
    "tkpc8k": ("b8 ch=8192 topk packed",
               base_cfg(fast_chunk=8192, compact_mode="topk",
                        composite_mode="packed"), None),
    "tkpc16k": ("b8 ch=16384 topk packed",
                base_cfg(fast_chunk=16384, compact_mode="topk",
                         composite_mode="packed"), None),
    "tkpc2k": ("b8 ch=2048 topk packed",
               base_cfg(fast_chunk=2048, compact_mode="topk",
                        composite_mode="packed"), None),
    "tkpcb5": ("b5 ch=4096 topk packed",
               base_cfg(fast_chunk=4096, compact_mode="topk",
                        composite_mode="packed", compact_budget=5), None),
    "tkpcb6": ("b6 ch=4096 topk packed",
               base_cfg(fast_chunk=4096, compact_mode="topk",
                        composite_mode="packed", compact_budget=6), None),
    "c4kks": ("b8 ch=4096 knn-skip", base_cfg(fast_chunk=4096), "knn"),
    "c4kxs": ("b8 ch=4096 extract-skip", base_cfg(fast_chunk=4096),
              "extract"),
    # thinner fat-cache rows: halves gather bytes + knn/extract work;
    # approximation only when a neighborhood exceeds cand_cap
    "cc32": ("b8 ch=4096 cand=32",
             base_cfg(fast_chunk=4096, cand_cap=32), None),
    "cc48": ("b8 ch=4096 cand=48",
             base_cfg(fast_chunk=4096, cand_cap=48), None),
    "co8cc32": ("b8 ch=4096 coarse S=8 cand=32",
                base_cfg(fast_chunk=4096, coarse_step=8,
                         coarse_win_budget=8, coarse_win_global=4,
                         cand_cap=32), None),
    "co8f2": ("b8 ch=4096 coarse S=8 + fused2",
              PointNerfConfig(
                  query=QueryConfig(
                      vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
                      SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
                      compact_budget=8, ray_slot_budget=32,
                      use_cache=False, fast_chunk=4096, coarse_step=8,
                      coarse_win_budget=8, coarse_win_global=4),
                  agg=AggregatorConfig(compute_dtype="bfloat16",
                                       fused_decode2=True)), None),
}


if __name__ == "__main__":
    main()

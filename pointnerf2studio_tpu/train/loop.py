"""The per-scene fine-tuning loop.

TPU-native counterpart of the reference's training drivers
(reference: pointnerf/run/train_ft.py:578-1034 epoch loop with
prune/grow scheduling, test/checkpoint cadence; and the nerfstudio
Trainer in the studio stack). One flat step loop — pruning flips mask
bits and rebuilds the voxel grid in place of the reference's
optimizer-rebuild-and-restart dance (train_ft.py:834-842,911).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.data.blender import BlenderDataset, PixelSampler
from pointnerf2studio_tpu.models import neural_points as npts
from pointnerf2studio_tpu.models.aggregator import AggregatorParams
from pointnerf2studio_tpu.models.neural_points import NeuralPointCloud
from pointnerf2studio_tpu.train.evaluator import evaluate_dataset
from pointnerf2studio_tpu.train.trainer import (
    TrainState, create_train_state, make_train_step)
from pointnerf2studio_tpu.utils import checkpoint_io as cio
from pointnerf2studio_tpu.utils.logger import Logger


@dataclasses.dataclass
class FitResult:
    state: TrainState
    metrics: Dict[str, float]
    out_dir: str
    # in-training eval trace (one entry per eval_freq crossing):
    # {"step", "wall_s", "psnr", ...metrics} — the source for
    # time-to-target-PSNR measurements (BASELINE.md tracked metric)
    eval_history: list = dataclasses.field(default_factory=list)
    # growth events: {"step", "grown_points", "n_alive"} per
    # probe_and_grow crossing (reference behavior anchor:
    # run/train_ft.py:844-923) — lets validation report the PSNR
    # trajectory across a growth event without log scraping
    grow_history: list = dataclasses.field(default_factory=list)

    def time_to_psnr(self, target_db: float):
        """(step, wall_s) of the first eval at/above target, or None.
        wall_s counts from fit() entry (excludes data/scene setup)."""
        for rec in self.eval_history:
            if rec.get("psnr", 0.0) >= target_db:
                return rec["step"], rec["wall_s"]
        return None


def fit(
    cfg: PointNerfConfig,
    dataset: BlenderDataset,
    params: AggregatorParams,
    points: NeuralPointCloud,
    out_dir: str,
    max_steps: Optional[int] = None,
    eval_dataset: Optional[BlenderDataset] = None,
    print_freq: int = 100,
    save_freq: int = 25_000,
    eval_freq: int = 0,
    eval_views: Optional[list] = None,
    mesh=None,
    seed: int = 0,
    eval_chunk: int = 4096,
    resume: bool = True,
    tensorboard: bool = False,
    eval_save_images: bool = False,
) -> FitResult:
    """Fine-tune `params` + `points` on `dataset`.

    With `resume` (default), an existing orbax checkpoint under
    `out_dir/ckpt` restores the full TrainState — params, point cloud,
    BOTH Adam states (whose step counts also restore the lr-schedule
    position) — and training continues from the saved step, the
    reference's checkpoint-restart elasticity pattern
    (train_ft.py:542-546,783-786 scheduler fast-forward).
    """
    os.makedirs(out_dir, exist_ok=True)
    logger = Logger(out_dir, tensorboard=tensorboard)
    max_steps = max_steps or cfg.train.max_iterations

    state = create_train_state(params, points, cfg)
    import time as _time
    t_fit0 = _time.time()
    eval_history: list = []
    grow_history: list = []
    start_step = 1
    if resume:
        last = cio.latest_step(os.path.join(out_dir, "ckpt"))
        if last is not None:
            # also restore a FINISHED run (last >= max_steps): the
            # loop below is then a no-op and fit() returns the trained
            # state — re-running an eval-after-train driver must not
            # retrain from scratch
            state = cio.restore_train_state(
                os.path.join(out_dir, "ckpt"), last, state)
            start_step = last + 1
            print(f"resumed from step {last}")
    from pointnerf2studio_tpu.ops.hash_grid import (
        HashGrid, build_query_grid)
    grid = build_query_grid(state.points.xyz, state.points.alive,
                            cfg.query)
    is_hash = isinstance(grid, HashGrid)
    if is_hash:
        # the sparse grid serves only the fast paths (see
        # QueryConfig.grid_mode); fail actionably up front
        if not cfg.train.fast_path:
            raise ValueError(
                "grid_mode resolved to the sparse hash grid, which "
                "requires TrainConfig.fast_path=True (the legacy train "
                "step needs dense tables)")
        if cfg.train.prob_freq > 0:
            raise ValueError(
                "point growing (prob_freq > 0) renders probes through "
                "the legacy path, which is dense-only; set prob_freq=0 "
                "for hash-grid scenes or use grid_mode='dense'")
        # sharded fast training works as-is: the geo pytree (incl. the
        # bucket table) is replicated per chip by the P() in_spec

    # Plane background: precompute per-view bg color maps once, index
    # them per batch by pixel id (reference: train_ft.py:604-612
    # create_all_bg + the bg_ray_lst pixel lookup at :208-211).
    bg_maps = None
    if cfg.bgmodel.endswith("plane"):
        from pointnerf2studio_tpu.models.bg_plane import create_all_bg
        alive = np.asarray(state.points.alive)
        bg_maps = create_all_bg(
            cfg, dataset,
            points_xyz=jnp.asarray(np.asarray(state.points.xyz)[alive]))

    use_fast = cfg.train.fast_path
    if (use_fast and cfg.train.march_auto and not cfg.query.march_steps
            and not isinstance(grid, HashGrid) and not cfg.inverse
            and cfg.query.compact_mode == "topk"
            and cfg.query.z_depth_dim <= 512):
        # auto-plan the jitter-aware train march from this scene's
        # cameras: sample rays across views, host-simulate, widen for
        # the jittered walk + batch-to-batch variation. The per-step
        # mc_overflow aux (logged by the step) re-verifies on device;
        # chip-measured +7% step rate at chair scale (PERF.md r4b).
        import dataclasses as _dc

        from pointnerf2studio_tpu.ops.march import (
            build_march_table, plan_march)
        occ = jnp.asarray(grid.coor_occ)
        tbl = np.asarray(jax.device_get(build_march_table(
            jnp.where(occ.astype(bool), 0, -1))))
        q = cfg.query
        vs = list(range(dataset.num_views))[:: max(
            dataset.num_views // 4, 1)][:4]
        rays_l, orig_l = [], []
        for v in vs:
            rv = np.asarray(dataset.full_image_rays(v))[::13][:8192]
            rays_l.append(rv)
            orig_l.append(np.broadcast_to(
                np.asarray(dataset.campos(v), np.float32), rv.shape))
        rays_p = np.concatenate(rays_l, 0)
        capm = min(q.SR, q.ray_slot_budget or q.SR, q.z_depth_dim)
        try:
            block_lens = tuple(rv.shape[0] for rv in rays_l)
            msteps, mbuckets = plan_march(
                tbl, np.asarray(jax.device_get(grid.ranges_min)),
                q.scaled_vsize,
                np.concatenate(orig_l, 0), rays_p,
                float(dataset.near), float(dataset.far),
                q.z_depth_dim, capm, slack=1.3,
                jitter=float(cfg.train.jitter),
                block_lens=block_lens)
            # the sim now models the jittered walk (plan_march jitter=)
            # so the fuel margin only covers batch-to-batch sampling
            # variation + growth headroom, not an unmodeled kernel
            msteps = tuple(int(s * 1.5) + 4 for s in msteps)
            # buckets were sized on per-view probe blocks; rescale to
            # the actual batch size with pixel-sampling slack
            rb_ = cfg.train.rays_per_batch
            bl0 = max(block_lens)
            mbuckets = tuple(
                min(rb_, (int(b * rb_ / bl0 * 1.2) + 255)
                    // 256 * 256 + 256) for b in mbuckets)
            cfg = _dc.replace(cfg, query=_dc.replace(
                q, march_steps=msteps, march_buckets=mbuckets))
            print(f"train march auto-plan: steps {msteps} "
                  f"buckets {mbuckets}")
        except Exception as e:     # planning must never kill training
            print(f"train march auto-plan failed ({e}); dense lookup")
    geo_state = {}

    def _oom_retry(fn, what, tries=4, wait_s=90.0):
        """Run a (functional, idempotent) rebuild with bounded retries
        on device RESOURCE_EXHAUSTED. The chip is a shared pool:
        transient co-tenant HBM pressure has killed mid-training
        structure rebuilds at scene sizes that pass trivially minutes
        later (r4 + r5 hole-wedge runs, identical config to surviving
        runs). A long training run must ride out a bad minute, not
        die in it. Only OOM is retried; other errors propagate."""
        import time as _time
        for a in range(tries):
            try:
                return fn()
            except Exception as e:
                if ("RESOURCE_EXHAUSTED" not in str(e)
                        or a + 1 == tries):
                    raise
                print(f"{what}: device OOM (transient pool "
                      f"pressure); retry {a + 1}/{tries - 1} in "
                      f"{wait_s:.0f}s", flush=True)
                _time.sleep(wait_s)

    def _make_geo(points, g):
        if isinstance(g, HashGrid):
            from pointnerf2studio_tpu.models.fast_train import (
                make_hash_geo_scene)
            return _oom_retry(lambda: make_hash_geo_scene(cfg, points, g),
                              "hash geo rebuild")
        from pointnerf2studio_tpu.models.fast_train import make_geo_scene
        return _oom_retry(lambda: make_geo_scene(cfg, points, g),
                          "geo rebuild")

    if use_fast:
        geo_state["geo"] = _make_geo(state.points, grid)
    if mesh is not None and use_fast:
        from pointnerf2studio_tpu.parallel.sharding import (
            make_sharded_fast_train_step)
        fast_step = make_sharded_fast_train_step(
            cfg, mesh, with_bg_ray=bg_maps is not None)

        def step_fn(st, _grid, campos, camrot, rays, gt, near, far, key,
                    *bg, **kw):
            geo, rmin, svs = geo_state["geo"]
            return fast_step(st, geo, jnp.asarray(rmin),
                             jnp.asarray(svs), campos, camrot, rays,
                             gt, near, far, key, *bg)
    elif mesh is not None:
        from pointnerf2studio_tpu.parallel.sharding import (
            make_sharded_train_step)
        step_fn = make_sharded_train_step(
            cfg, mesh, with_bg_ray=bg_maps is not None)
    elif use_fast:
        from pointnerf2studio_tpu.models.fast_train import (
            make_fast_train_step)
        fast_step = make_fast_train_step(cfg)

        def step_fn(st, _grid, campos, camrot, rays, gt, near, far, key,
                    *bg, **kw):
            geo, rmin, svs = geo_state["geo"]
            bg_rgb = bg[0] if bg else None
            return fast_step(st, geo, rmin, svs, campos, camrot, rays,
                             gt, near, far, key, bg_rgb=bg_rgb, **kw)
    else:
        step_fn = make_train_step(cfg)

    sampler = PixelSampler(dataset, cfg.train.rays_per_batch, seed=seed,
                           mode=cfg.train.random_sample)
    key = jax.random.PRNGKey(seed)
    t = cfg.train
    # Per-view ray-miss loss ranking for probe-frame selection
    # (reference: mvs_points_volumetric_model.update_rank_ray_miss
    # :134-153 — probe the frames the model misses the most).
    miss_rank: Dict[int, float] = {}
    miss_pairs: list = []     # device (view, loss) pairs, dev sampler
    last_saved = -1

    # Device-resident sampling: images/poses/bg maps upload ONCE and
    # the pixel draw + ray math + train step fuse into ONE jitted
    # dispatch with no per-step host->device transfers. Everything the
    # step needs is passed as ARGUMENTS (closures would bake arrays
    # into the jaxpr as constants — fatal with a remote compiler).
    use_dev = (mesh is None and t.device_sampling
               and t.random_sample == "random")
    if use_dev:
        V = dataset.num_views
        Hh, Ww = dataset.hw
        B = t.rays_per_batch
        intr = np.asarray(dataset.intrinsics, np.float64)
        fx, fy = float(intr[0, 0]), float(intr[1, 1])
        cx, cy = float(intr[0, 2]), float(intr[1, 2])
        need_mask = (dataset.alphas is not None
                     and any(n.startswith("ray_depth_masked_")
                             for n in t.color_loss_items))
        imgs_d = jnp.asarray(dataset.images, jnp.float32)
        alph_d = (jnp.asarray(dataset.alphas, jnp.float32)
                  if need_mask else None)
        bgm_d = (jnp.asarray(bg_maps, jnp.float32)
                 if bg_maps is not None else None)
        campos_d = jnp.asarray(np.stack(
            [dataset.campos(v) for v in range(V)]), jnp.float32)
        camrot_d = jnp.asarray(np.stack(
            [dataset.camrotc2w(v) for v in range(V)]), jnp.float32)
        near_d = jnp.asarray(dataset.near, jnp.float32)
        far_d = jnp.asarray(dataset.far, jnp.float32)

        def _dev_sample(key, imgs, alph, bgm, campos_all, camrot_all):
            kv, kx, ky, sub = jax.random.split(key, 4)
            view = jax.random.randint(kv, (), 0, V)
            xs = jax.random.randint(kx, (B,), 0, Ww)
            ys = jax.random.randint(ky, (B,), 0, Hh)
            gt = imgs[view, ys, xs]
            # pixel_raydirs semantics (data/blender.py:72-82)
            x = (xs.astype(jnp.float32) + 0.5 - cx) / fx
            y = (ys.astype(jnp.float32) + 0.5 - cy) / fy
            camrot = camrot_all[view]
            dirs = jnp.stack([x, y, jnp.ones_like(x)], -1) @ camrot.T
            dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True)
                           + 1e-5)
            bgc = None if bgm is None else bgm[view, ys, xs]
            gtm = None if alph is None else alph[view, ys, xs] > 0.0
            return view, campos_all[view], camrot, dirs, gt, bgc, gtm, sub

        if use_fast:
            def _one_dev(st, sub, geo, rmin_a, svs_a, imgs, alph, bgm,
                         campos_all, camrot_all):
                view, campos, camrot, dirs, gt, bgc, gtm, sub2 = (
                    _dev_sample(sub, imgs, alph, bgm, campos_all,
                                camrot_all))
                kw = {} if gtm is None else {"gt_mask": gtm}
                st2, aux = fast_step(st, geo, rmin_a, svs_a, campos,
                                     camrot, dirs, gt, near_d, far_d,
                                     sub2, bg_rgb=bgc, **kw)
                return st2, aux, view
        else:
            def _one_dev(st, sub, grid_a, imgs, alph, bgm, campos_all,
                         camrot_all):
                view, campos, camrot, dirs, gt, bgc, gtm, sub2 = (
                    _dev_sample(sub, imgs, alph, bgm, campos_all,
                                camrot_all))
                bg_args = () if bgc is None else (bgc,)
                kw = {} if gtm is None else {"gt_mask": gtm}
                st2, aux = step_fn(st, grid_a, campos, camrot, dirs,
                                   gt, near_d, far_d, sub2, *bg_args,
                                   **kw)
                return st2, aux, view

        def _make_dev_step(k_inner):
            # k_inner optimizer steps per dispatch (lax.scan): the
            # per-step PRNG split (key, sub = split(key)) runs INSIDE,
            # replaying exactly the single-dispatch loop's sequence —
            # the trajectory is bit-identical for any k_inner
            # (TrainConfig.steps_per_dispatch).
            @jax.jit
            def dev_step(st, key, *args):
                if k_inner == 1:
                    key2, sub = jax.random.split(key)
                    st2, aux, view = _one_dev(st, sub, *args)
                    return st2, key2, aux, view

                def body(carry, _):
                    st_c, key_c = carry
                    key_c, sub = jax.random.split(key_c)
                    st2, aux, view = _one_dev(st_c, sub, *args)
                    return (st2, key_c), (aux, view)

                (st2, key2), (auxs, views) = jax.lax.scan(
                    body, (st, key), None, length=k_inner)
                return st2, key2, auxs, views
            return dev_step

        K = max(1, int(t.steps_per_dispatch))
        dev_step_K = _make_dev_step(K)
        dev_step_1 = dev_step_K if K == 1 else _make_dev_step(1)

    step = start_step
    while step <= max_steps:
        if use_dev:
            # the per-step key advance happens inside dev_step
            k_eff = K if step + K - 1 <= max_steps else 1
            ds = dev_step_K if k_eff != 1 else dev_step_1
            if use_fast:
                geo, rmin_g, svs_g = geo_state["geo"]
                state, key, aux, view_dev = ds(
                    state, key, geo, jnp.asarray(rmin_g),
                    jnp.asarray(svs_g), imgs_d, alph_d, bgm_d,
                    campos_d, camrot_d)
            else:
                state, key, aux, view_dev = ds(
                    state, key, grid, imgs_d, alph_d, bgm_d,
                    campos_d, camrot_d)
            logger.accumulate({k: v for k, v in aux.items()})
            if (t.prob_freq > 0
                    and "ray_miss_coarse_raycolor_loss" in aux):
                # scalar (k_eff == 1) or [k_eff]-stacked device pairs;
                # converted at probe time
                miss_pairs.append(
                    (view_dev, aux["ray_miss_coarse_raycolor_loss"]))
            b = None
        else:
            k_eff = 1
            key, sub = jax.random.split(key)
            b = sampler.next_batch()
            bg_args = ()
            if bg_maps is not None:
                xy = b["pixel_xy"]
                bg_args = (jnp.asarray(
                    bg_maps[b["view"], xy[:, 1], xy[:, 0]]),)
            kw = {}
            if (mesh is None and "gt_mask" in b
                    and any(n.startswith("ray_depth_masked_")
                            for n in t.color_loss_items)):
                kw["gt_mask"] = jnp.asarray(b["gt_mask"])
            state, aux = step_fn(
                state, grid,
                jnp.asarray(b["campos"]), jnp.asarray(b["camrotc2w"]),
                jnp.asarray(b["raydirs"]), jnp.asarray(b["gt_rgb"]),
                jnp.asarray(b["near"], jnp.float32),
                jnp.asarray(b["far"], jnp.float32), sub, *bg_args, **kw)
            logger.accumulate({k: v for k, v in aux.items()})
            if "ray_miss_coarse_raycolor_loss" in aux:
                # keep the device scalar — float() here would sync
                # every step (ranking consumers convert at use time)
                miss_rank[b["view"]] = (
                    aux["ray_miss_coarse_raycolor_loss"])

        # with k_eff steps per dispatch, cadences fire at the first
        # dispatch boundary at-or-after their step (a cadence crossing
        # within the window); k_eff == 1 reduces to `step % freq == 0`
        s0, step = step, step + k_eff
        s_end = step - 1

        def crossed(freq):
            return freq and (s_end // freq) > ((s0 - 1) // freq)

        if crossed(print_freq):
            n_alive = int(np.asarray(state.points.num_alive))
            logger.flush(s_end, extra={"n_points": n_alive})

        # Prune low-confidence points + rebuild the grid
        # (reference: train_ft.py:834-842 -> NeuralPoints.prune).
        if (t.prune_iter > 0 and crossed(t.prune_iter)
                and s0 <= t.prune_max_iter):
            def _prune_rebuild():
                pruned = npts.prune(state.points, t.prune_thresh)
                g2 = build_query_grid(pruned.xyz, pruned.alive,
                                      cfg.query)
                # materialize inside the retry scope: an async OOM
                # from these builds must surface HERE, not at some
                # later unrelated fetch (r5 hole run: the crash
                # surfaced inside make_geo_scene's first device_get)
                int(jax.device_get(g2.n_occ))
                return pruned, g2
            pruned, grid = _oom_retry(_prune_rebuild,
                                      "prune+grid rebuild")
            state = state.replace(points=pruned)
            if use_fast:
                # the outgoing geo cache is stale the moment the grid
                # changed; dropping it BEFORE the rebuild frees its
                # rows for the build's working set (the post-growth
                # rebuild OOMs at razor-thin margins — r5 isolation)
                geo_state.pop("geo", None)
                geo_state["geo"] = _make_geo(state.points, grid)

        # Probe holes + grow points (reference: train_ft.py:844-923).
        if t.prob_freq > 0 and crossed(t.prob_freq):
            from pointnerf2studio_tpu.train.grow import probe_and_grow
            n_views = max(1, dataset.num_views // t.prob_num_step)
            if miss_pairs:
                for v, l in jax.device_get(miss_pairs):
                    # scalar (1/dispatch) or [k]-stacked entries
                    for vi, li in zip(np.atleast_1d(v),
                                      np.atleast_1d(l)):
                        miss_rank[int(vi)] = float(li)
                miss_pairs.clear()
            if miss_rank:
                # worst ray-miss frames first; random fill-up (the
                # stored device scalars convert here, off the hot loop)
                miss_f = {k: float(v) for k, v in miss_rank.items()}
                ranked = sorted(miss_f, key=miss_f.get, reverse=True)
                probe_views = ranked[:n_views]
                miss_rank.clear()   # reset_ray_miss_ranking (:164-167)
            else:
                probe_views = []
            if len(probe_views) < n_views:
                rest = [v for v in np.random.default_rng(s_end).permutation(
                    dataset.num_views) if v not in probe_views]
                probe_views += list(rest[:n_views - len(probe_views)])
            state, grid, n_new = _oom_retry(
                lambda: probe_and_grow(
                    cfg, state, grid, dataset, views=probe_views,
                    chunk=eval_chunk, opacity_thresh=t.prob_thresh,
                    prob_mul=t.prob_mul),
                "growth probe")
            if use_fast and n_new:
                geo_state.pop("geo", None)   # stale post-growth; free
                geo_state["geo"] = _make_geo(state.points, grid)
            grow_history.append({
                "step": s_end, "grown_points": int(n_new),
                "n_alive": int(np.asarray(state.points.num_alive))})
            logger.flush(s_end, extra={"grown_points": n_new})

        if save_freq and crossed(save_freq):
            save_checkpoint(out_dir, state, s_end)
            last_saved = s_end

        if crossed(eval_freq) and eval_dataset is not None:
            m = evaluate_dataset(
                cfg, state.params, state.points, grid, eval_dataset,
                views=eval_views, chunk=eval_chunk, fast=is_hash,
                bg_src_dataset=dataset if bg_maps is not None else None,
                # one directory per eval step, the reference's
                # prob_img_{iter} layout that vis_grow_train.py
                # assembles into growth videos (cli grow-video)
                save_images=eval_save_images,
                out_dir=(os.path.join(out_dir, f"evalimg_{s_end:06d}")
                         if eval_save_images else None))
            eval_history.append({
                "step": s_end,
                "wall_s": round(_time.time() - t_fit0, 1), **m})
            logger.flush(s_end, extra={f"eval_{k}": v
                                       for k, v in m.items()})

    if last_saved != max_steps:
        # the cadence save may already have written this exact step —
        # orbax refuses to overwrite an existing step directory
        save_checkpoint(out_dir, state, max_steps)
    metrics: Dict[str, float] = {}
    if eval_dataset is not None:
        metrics = evaluate_dataset(
            cfg, state.params, state.points, grid, eval_dataset,
            views=eval_views, chunk=eval_chunk, fast=is_hash,
            bg_src_dataset=dataset if bg_maps is not None else None)
        eval_history.append({
            "step": max_steps,
            "wall_s": round(_time.time() - t_fit0, 1), **metrics})
        logger.flush(max_steps, extra={f"final_{k}": v
                                       for k, v in metrics.items()})
    return FitResult(state=state, metrics=metrics, out_dir=out_dir,
                     eval_history=eval_history, grow_history=grow_history)


def save_checkpoint(out_dir: str, state: TrainState, step: int,
                    best_psnr: float = 0.0) -> None:
    """Native orbax checkpoint + reference-compatible torch export
    (both the net file and the `<step>_states.pth` sidecar the
    reference's resume tooling reads)."""
    cio.save_train_state(os.path.join(out_dir, "ckpt"), state, step)
    cio.export_torch_checkpoint(
        state.params, state.points,
        os.path.join(out_dir, f"{step}_net_ray_marching.pth"))
    cio.export_states_file(
        os.path.join(out_dir, f"{step}_states.pth"),
        epoch_count=0, total_steps=step, best_PSNR=best_psnr)

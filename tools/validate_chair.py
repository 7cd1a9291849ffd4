"""End-to-end validation on the procedural chair (plan-B for the real
NeRF-Synthetic track — no datasets / no egress on this machine, see
VALIDATION.md).

Pipeline (all the same code a real chair would run):
  1. MVSNet point generation with the SHIPPED pretrained checkpoint
     (model_000014.ckpt) + FPN embedding (best_net_mvs.pth),
  2. fine-tune the cloud + MLPs for --steps,
  3. evaluate test views through BOTH render paths: legacy (f32
     attrs) and fast (fat cache, bf16 attrs, ray_slot_budget) —
     reporting PSNR/SSIM, per-ray mask agreement, and the color delta
     attributable to the fast path's bf16 packing.

Usage:  python tools/validate_chair.py <data_dir> <out_dir>
             [--steps N] [--factor F]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MVS_CKPT = "/root/reference/pointnerf/mvsnet_checkpoints/MVSNet/model_000014.ckpt"
FPN_CKPT = ("/root/reference/pointnerf/mvsnet_checkpoints/init/"
            "dtu_dgt_d012_img0123_conf_agg2_32_dirclr20/best_net_mvs.pth")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data")
    ap.add_argument("out")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--factor", type=int, default=1)
    ap.add_argument("--eval-views", type=int, default=4)
    ap.add_argument("--vox-res", type=int, default=320)
    ap.add_argument("--d", type=int, default=400)
    # filter thresholds: the reference defaults (conf 0.8) assume real
    # photographic texture; the synthetic chair runs lower confidence
    ap.add_argument("--conf-thresh", type=float, default=0.3)
    ap.add_argument("--geo-num", type=int, default=2)
    # init source: "mvs" = pretrained-MVSNet generation (requires
    # photographic-texture statistics the pretrained net learned on
    # DTU — measured 13% median depth error on the synthetic chair,
    # so the geo-consistency gate correctly rejects it); "depth" =
    # GT depth maps (data/procedural.py save_depth; the ScanNet
    # sensor-depth init path, init_points_from_depth).
    ap.add_argument("--init", choices=("mvs", "depth"), default="depth")
    # full recipe (VERDICT r2 #5): keep the preset's prune/grow
    # cadences instead of disabling them, eval during training, and
    # record time-to-target-PSNR from FitResult.eval_history
    ap.add_argument("--full-recipe", action="store_true")
    ap.add_argument("--eval-freq", type=int, default=0,
                    help="in-training eval cadence; 0 = steps // 10")
    ap.add_argument("--target-db", type=float, default=30.0)
    # growth-at-scale demonstration (VERDICT r3 #7): carve an azimuth
    # wedge out of the INIT cloud so probe_and_grow has a real hole to
    # fill — GT-depth init otherwise leaves nothing to grow and the
    # 800p validation recorded grown_points == 0. The PSNR trajectory
    # across the growth events lands in report["eval_history"] next to
    # report["grow_history"].
    ap.add_argument("--hole-wedge", type=float, default=0.0,
                    help="drop init points within this azimuth wedge "
                         "(degrees, centered on +x); 0 = off")
    # isolation knob for the wedge-linked OOM (STATUS.md round 5):
    # overrides the wedge's steps//4 probe cadence so the prune
    # rebuild can fire with the prob machinery held out of the run
    ap.add_argument("--prob-freq", type=int, default=0,
                    help="override TrainConfig.prob_freq (0 = keep)")
    # procedural scene style (v2 = band-limited + specular + AA: the
    # variant whose reachable PSNR clears the 30 dB instrument)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from pointnerf2studio_tpu.data.blender import load_blender
    from pointnerf2studio_tpu.data.mvs_batches import build_view_batches
    from pointnerf2studio_tpu.data.presets import nerf_synth_config
    from pointnerf2studio_tpu.models import neural_points as npts
    from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
    from pointnerf2studio_tpu.models.mvsnet import (
        load_fpn_params, load_mvsnet_params)
    from pointnerf2studio_tpu.models.mvsnet.pointgen import (
        PointGenConfig, generate_point_cloud)
    from pointnerf2studio_tpu.ops.grid import build_grid_from_points
    from pointnerf2studio_tpu.train.evaluator import evaluate_dataset
    from pointnerf2studio_tpu.train.loop import fit

    os.makedirs(args.out, exist_ok=True)
    report = {}

    cfg = nerf_synth_config("chair")
    cfg = dataclasses.replace(
        cfg,
        query=dataclasses.replace(cfg.query, z_depth_dim=args.d,
                                  ray_slot_budget=32, fast_chunk=4096),
        agg=dataclasses.replace(cfg.agg, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train,
                                  **({} if args.full_recipe else
                                     dict(prob_freq=0, prune_iter=0)),
                                  # flagship differentiable fast path
                                  # (trajectory-matched to legacy in
                                  # tests/test_fast_train.py); ~3x the
                                  # legacy step rate at chair scale.
                                  # 8 steps/dispatch amortizes the
                                  # remote-tunnel dispatch latency
                                  # (bit-exact, test_train_loop.py)
                                  fast_path=True,
                                  steps_per_dispatch=8))

    t0 = time.time()
    train_ds = load_blender(args.data, "train", factor=args.factor)
    test_ds = load_blender(args.data, "test", factor=args.factor)
    print(f"data: {train_ds.num_views} train / {test_ds.num_views} test "
          f"views @ {train_ds.hw}", flush=True)

    # ---- 1. point-cloud init ----
    if args.init == "mvs":
        mvs_params = load_mvsnet_params(MVS_CKPT)
        fpn_params = load_fpn_params(FPN_CKPT)
        batches, alphas, aK, aE = build_view_batches(train_ds, num_src=2)
        pg = PointGenConfig(vox_res=args.vox_res, ranges=cfg.query.ranges,
                            depth_conf_thresh=args.conf_thresh,
                            geo_cnsst_num=args.geo_num)
        pc = generate_point_cloud(mvs_params, fpn_params, batches,
                                  alphas=alphas, alpha_intrinsics=aK,
                                  alpha_w2cs=aE, cfg=pg)
        n_pts = pc["xyz"].shape[0]
        cap = -(-int(n_pts * 1.3) // 4096) * 4096
        cloud = npts.from_arrays(pc["xyz"], pc["embedding"], pc["conf"],
                                 pc["dir"], pc["color"], capacity=cap)
    else:
        # depth-init (ScanNet sensor-depth flow): unproject GT depth
        # maps, voxel-downsample, init features
        from pointnerf2studio_tpu.data.pointcloud_init import (
            init_cloud_from_points, init_points_from_depth)
        depths = np.stack([
            np.load(os.path.join(args.data, "train", f"depth_{k}.npy"))
            for k in range(train_ds.num_views)])
        if args.factor > 1:   # depth maps ship at full resolution
            depths = depths[:, ::args.factor, ::args.factor]
        xyz, color = init_points_from_depth(
            depths, train_ds.poses, train_ds.intrinsics,
            images=train_ds.images, stride=2, max_depth=6.0)
        cloud = init_cloud_from_points(
            xyz, color, feat_dim=cfg.agg.point_features_dim,
            feature_init_method="rand", default_conf=0.3,
            vox_res=args.vox_res, ranges=cfg.query.ranges)
        n_pts = int(np.asarray(cloud.num_alive))
    print(f"init cloud: {n_pts} points (+{time.time()-t0:.0f}s)",
          flush=True)
    report["n_points"] = int(n_pts)
    if args.hole_wedge > 0:
        # deliberate init hole: drop points whose azimuth falls in the
        # wedge. Growth must rediscover this geometry from the miss-ray
        # probes (reference behavior: train_ft.py:844-923). The preset
        # probes at 10001 steps; shorter demonstration runs need the
        # cadence inside their budget — several growth events with
        # PSNR evals between them.
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, prob_freq=min(cfg.train.prob_freq,
                                     max(args.steps // 4, 500))))
        print(f"hole run: prob_freq -> {cfg.train.prob_freq}")
    if args.prob_freq:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, prob_freq=args.prob_freq))
        print(f"prob_freq override -> {args.prob_freq}")
        xyz_np = np.asarray(cloud.xyz)
        az = np.degrees(np.arctan2(xyz_np[:, 1], xyz_np[:, 0]))
        in_wedge = np.abs(az) < args.hole_wedge / 2
        alive_np = np.asarray(cloud.alive) & ~in_wedge
        cloud = cloud.replace(alive=jnp.asarray(alive_np))
        n_after = int(alive_np.sum())
        print(f"hole wedge {args.hole_wedge} deg: {n_pts} -> {n_after} "
              f"points", flush=True)
        report["n_points_after_hole"] = n_after
    params = init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)

    # ---- 2. fine-tune ----
    eval_freq = args.eval_freq or max(args.steps // 10, 1)
    res = fit(cfg, train_ds, params, cloud, os.path.join(args.out, "run"),
              max_steps=args.steps, print_freq=500,
              save_freq=max(args.steps // 2, 1),
              eval_dataset=test_ds, eval_views=[0, 1],
              eval_freq=eval_freq)
    state = res.state
    print(f"trained {args.steps} steps (+{time.time()-t0:.0f}s)",
          flush=True)
    report["eval_history"] = res.eval_history
    report["grow_history"] = res.grow_history
    tt = res.time_to_psnr(args.target_db)
    report[f"time_to_{args.target_db:g}db"] = (
        None if tt is None else {"step": tt[0], "wall_s": tt[1]})
    print(f"time to {args.target_db:g} dB: {tt}", flush=True)

    # ---- 3. eval both paths ----
    grid = build_grid_from_points(state.points.xyz, state.points.alive,
                                  cfg.query)
    views = list(range(min(args.eval_views, test_ds.num_views)))
    m_legacy = evaluate_dataset(
        cfg, state.params, state.points, grid, test_ds, views=views,
        chunk=16384, out_dir=os.path.join(args.out, "eval_legacy"),
        save_images=True)
    print("legacy:", m_legacy, flush=True)
    # frame=False: the frame renderer's per-tier programs would each
    # recompile (~11 min/tier remotely); the plain fast chunk loop is
    # ONE program and this is a correctness check, not a speed run
    m_fast = evaluate_dataset(
        cfg, state.params, state.points, grid, test_ds, views=views,
        chunk=16384, fast=True, frame=False,
        out_dir=os.path.join(args.out, "eval_fast"), save_images=True)
    print("fast:  ", m_fast, flush=True)
    report["legacy"] = m_legacy
    report["fast"] = m_fast

    # ---- 4. fast-vs-legacy agreement on one view (bf16 sensitivity +
    #         ray_slot_budget tail-drop, measured on REAL-geometry
    #         point distribution) ----
    from pointnerf2studio_tpu.models.fast_render import (
        fast_render_rays_jit, make_fast_scene)
    from pointnerf2studio_tpu.models.render import render_rays_jit
    v = views[0]
    # 16k rays: a 65k-ray single-dispatch LEGACY render at full 800p
    # chair scale compiled for 55+ min on the remote backend (the r4c
    # run was killed there; the shipped evaluator chunks at 16k too)
    rays = jnp.asarray(test_ds.full_image_rays(v)[:16384])
    ref = render_rays_jit(state.params, state.points, grid,
                          jnp.asarray(test_ds.campos(v)),
                          jnp.asarray(test_ds.camrotc2w(v)), rays,
                          jnp.asarray(test_ds.near),
                          jnp.asarray(test_ds.far), cfg)
    cache, rmin, svs = make_fast_scene(cfg, state.points, grid,
                                       near=test_ds.near, far=test_ds.far,
                                       params=state.params)
    out = fast_render_rays_jit(
        state.params, state.points.Rw2c, cache,
        jnp.asarray(test_ds.campos(v)),
        jnp.asarray(test_ds.camrotc2w(v)), rays,
        jnp.asarray(test_ds.near), jnp.asarray(test_ds.far), cfg,
        rmin, svs)
    mref = np.asarray(ref.ray_mask)
    mfast = np.asarray(out.ray_mask)
    agree = float((mref == mfast).mean())
    both = mref & mfast
    diff = np.abs(np.asarray(out.coarse_raycolor)
                  - np.asarray(ref.coarse_raycolor))[both]
    report["mask_agreement"] = agree
    report["color_diff_mean"] = float(diff.mean()) if both.any() else 0.0
    report["color_diff_p99"] = (float(np.percentile(diff, 99))
                                if both.any() else 0.0)
    print(f"mask agreement {agree:.6f}  color diff mean "
          f"{report['color_diff_mean']:.5f} p99 "
          f"{report['color_diff_p99']:.5f}", flush=True)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

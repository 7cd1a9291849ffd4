"""Command-line interface.

The public surface replacing the reference's entry points
(reference: run/train_ft.py, run/gen_pnts.py, run/test_ft.py,
run/render_vid.py, run/editing.py and the `ns-train pointnerf-original`
nerfstudio method, pyproject.toml:24-25):

  python -m pointnerf2studio_tpu.cli train --scene chair --data <dir> \
      --point-cloud <ckpt dir> --out <dir>
  python -m pointnerf2studio_tpu.cli eval --scene chair --data <dir> \
      --checkpoint <pth> --out <dir>
  python -m pointnerf2studio_tpu.cli render-video --scene chair ...
  python -m pointnerf2studio_tpu.cli gen-points --scene chair ...
  python -m pointnerf2studio_tpu.cli edit --parts a.pth b.pth ...
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import sys
from typing import Optional


def _latest_ckpt(path: str) -> str:
    """Newest `<iter>_net_ray_marching.pth` in a directory (reference
    get_latest_epoch semantics, studio_model.py:55-59)."""
    if os.path.isfile(path):
        return path
    cands = glob.glob(os.path.join(path, "*_net_ray_marching.pth"))
    if not cands:
        raise FileNotFoundError(
            f"no *_net_ray_marching.pth under {path}")
    return max(cands, key=lambda p: int(os.path.basename(p).split("_")[0]))


def _load_scene(args):
    from pointnerf2studio_tpu.data.blender import load_blender
    from pointnerf2studio_tpu.data.presets import get_preset

    cfg = get_preset(args.scene)
    if getattr(args, "rays_per_batch", None):
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, rays_per_batch=args.rays_per_batch))
    if getattr(args, "max_steps", None):
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, max_iterations=args.max_steps))
    train_ds = load_blender(args.data, "train", factor=args.factor)
    try:
        eval_ds = load_blender(args.data, "test", factor=args.factor)
    except FileNotFoundError:
        eval_ds = train_ds
    return cfg, train_ds, eval_ds


def cmd_train(args):
    import jax

    from pointnerf2studio_tpu.train.loop import fit
    from pointnerf2studio_tpu.utils import checkpoint_io as cio

    cfg, train_ds, eval_ds = _load_scene(args)
    params, points = cio.load_reference_checkpoint(
        _latest_ckpt(args.point_cloud), capacity=args.capacity)
    if points is None:
        raise SystemExit("checkpoint has no neural_points; run gen-points")
    mesh = None
    if args.num_devices > 1:
        from pointnerf2studio_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(args.num_devices)
    res = fit(cfg, train_ds, params, points, args.out,
              eval_dataset=eval_ds, eval_views=list(range(args.eval_views)),
              eval_freq=args.eval_freq, mesh=mesh,
              tensorboard=getattr(args, "tensorboard", False),
              eval_save_images=getattr(args, "eval_images", False))
    print("final metrics:", res.metrics)


def cmd_eval(args):
    from pointnerf2studio_tpu.ops.hash_grid import (
        HashGrid, build_query_grid)
    from pointnerf2studio_tpu.train.evaluator import evaluate_dataset
    from pointnerf2studio_tpu.utils import checkpoint_io as cio

    cfg, train_ds, eval_ds = _load_scene(args)
    params, points = cio.load_reference_checkpoint(
        _latest_ckpt(args.checkpoint))
    grid = build_query_grid(points.xyz, points.alive, cfg.query)
    if isinstance(grid, HashGrid) and not args.fast:
        print("hash-grid scene: the legacy eval path is dense-only; "
              "rendering through the fast path")
        args.fast = True
    views = list(range(args.eval_views)) if args.eval_views else None
    m = evaluate_dataset(cfg, params, points, grid, eval_ds, views=views,
                         out_dir=args.out, save_images=bool(args.out),
                         fast=args.fast,
                         bg_src_dataset=(train_ds if cfg.bgmodel.endswith(
                             "plane") else None))
    print(m)


def cmd_render_video(args):
    from pointnerf2studio_tpu.ops.hash_grid import (
        HashGrid, build_query_grid)
    from pointnerf2studio_tpu.train.evaluator import render_video
    from pointnerf2studio_tpu.utils import checkpoint_io as cio

    cfg, train_ds, _ = _load_scene(args)
    params, points = cio.load_reference_checkpoint(
        _latest_ckpt(args.checkpoint))
    grid = build_query_grid(points.xyz, points.alive, cfg.query)
    fast = args.fast or isinstance(grid, HashGrid)
    poses = None
    if args.path == "interpolate":
        from pointnerf2studio_tpu.train.evaluator import interpolated_poses
        poses = interpolated_poses(train_ds.poses, n_views=args.frames)
    path = render_video(cfg, params, points, grid, train_ds.intrinsics,
                        train_ds.hw, train_ds.near, train_ds.far,
                        args.out, n_frames=args.frames, fast=fast,
                        poses=poses)
    print("wrote", path)


def cmd_gen_points(args):
    import numpy as np

    from pointnerf2studio_tpu.data.blender import load_blender
    from pointnerf2studio_tpu.data.mvs_batches import build_view_batches
    from pointnerf2studio_tpu.data.presets import get_preset
    from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
    from pointnerf2studio_tpu.models.mvsnet import (
        load_fpn_params, load_mvsnet_params)
    from pointnerf2studio_tpu.models.mvsnet.pointgen import (
        PointGenConfig, generate_point_cloud)
    from pointnerf2studio_tpu.models import neural_points as npts
    from pointnerf2studio_tpu.utils import checkpoint_io as cio
    import jax

    cfg = get_preset(args.scene)

    if args.from_ply:
        # COLMAP/PLY initialization path (reference w_colmap_n360
        # family: load_init_points, nerf_synth360_ft_dataset.py:358-375)
        from pointnerf2studio_tpu.data.pointcloud_init import (
            init_cloud_from_points, load_ply)
        d = load_ply(args.from_ply)
        if args.comb_file:
            # reference --comb_file: extra xyz rows from a ';'-delimited
            # txt are concatenated onto the PLY cloud
            # (nerf_synth360_ft_dataset.py:369-374)
            import numpy as np
            extra = np.loadtxt(args.comb_file, delimiter=";", ndmin=2)
            d["xyz"] = np.concatenate(
                [d["xyz"], extra[:, :3].astype(np.float32)], 0)
            if d["color"] is not None:
                pad = np.full((extra.shape[0], 3), 0.5, np.float32)
                d["color"] = np.concatenate([d["color"], pad], 0)
        cloud = init_cloud_from_points(
            d["xyz"], d["color"], feat_dim=cfg.agg.point_features_dim,
            vox_res=args.vox_res, ranges=cfg.query.ranges,
            capacity=args.capacity, point_noise=args.point_noise)
        params = cio.import_aggregator_params(
            cio.load_torch_state_dict(args.init_mlp)) if args.init_mlp \
            else init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
        os.makedirs(args.out, exist_ok=True)
        out_path = os.path.join(args.out, "0_net_ray_marching.pth")
        cio.export_torch_checkpoint(params, cloud, out_path)
        print("wrote", out_path)
        return

    ds = load_blender(args.data, "train", factor=args.factor)
    mvs_params = load_mvsnet_params(args.mvsnet_ckpt)
    fpn_params = load_fpn_params(args.fpn_ckpt)
    batches, alphas, aK, aE = build_view_batches(
        ds, num_src=args.num_src, max_batches=args.max_batches,
        pairing=args.pairing)
    pg = PointGenConfig(vox_res=args.vox_res, ranges=cfg.query.ranges)
    pc = generate_point_cloud(mvs_params, fpn_params, batches,
                              alphas=alphas, alpha_intrinsics=aK,
                              alpha_w2cs=aE, cfg=pg)
    print("generated", pc["xyz"].shape[0], "points")
    cloud = npts.from_arrays(pc["xyz"], pc["embedding"], pc["conf"],
                             pc["dir"], pc["color"],
                             capacity=args.capacity)
    params = cio.import_aggregator_params(
        cio.load_torch_state_dict(args.init_mlp)) if args.init_mlp else \
        init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
    os.makedirs(args.out, exist_ok=True)
    cio.export_torch_checkpoint(
        params, cloud, os.path.join(args.out, "0_net_ray_marching.pth"))
    print("wrote", os.path.join(args.out, "0_net_ray_marching.pth"))


def cmd_train_joint(args):
    """Joint MVS + render training (reference mode 0, learned depth):
    regenerate the point cloud from the MVS nets every step and train
    both stacks end-to-end (reference:
    mvs_points_volumetric_model.py:38-45 + train_ft.py with --mode 0).
    Seeds FeatureNet/premlp from --net-mvs when given
    (mvs_points_model.py:79)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointnerf2studio_tpu.data.blender import load_blender
    from pointnerf2studio_tpu.data.mvs_batches import build_view_batches
    from pointnerf2studio_tpu.data.presets import get_preset
    from pointnerf2studio_tpu.models.aggregator import init_aggregator_params
    from pointnerf2studio_tpu.ops.grid import compute_grid_geometry
    from pointnerf2studio_tpu.train.joint import (
        MVSTrainBatch, create_joint_state, generate_points_diff,
        load_pretrained_joint_params, make_joint_train_step)
    from pointnerf2studio_tpu.utils import checkpoint_io as cio
    from pointnerf2studio_tpu.utils.logger import Logger

    cfg = get_preset(args.scene)
    ds = load_blender(args.data, "train", factor=args.factor)
    batches, _, _, _ = build_view_batches(ds, num_src=args.num_src)
    key = jax.random.PRNGKey(0)
    fields = cio.import_aggregator_params(
        cio.load_torch_state_dict(args.init_mlp)) if args.init_mlp \
        else init_aggregator_params(key, cfg.agg)
    nv = args.num_src + 1
    mvs = (load_pretrained_joint_params(key, args.net_mvs, num_views=nv)
           if args.net_mvs else None)
    state = create_joint_state(key, fields, cfg, num_views=nv,
                               mvs_lr=args.mvs_lr, mvs=mvs)
    r = cfg.query.ranges
    rmin, dims = compute_grid_geometry(
        np.asarray(r[:3]), np.asarray(r[3:]), cfg.query)
    step_fn = make_joint_train_step(cfg, rmin, dims, mvs_lr=args.mvs_lr,
                                    num_depth=args.num_depth)
    os.makedirs(args.out, exist_ok=True)
    logger = Logger(args.out)
    rng = np.random.default_rng(0)
    R = cfg.train.rays_per_batch
    h, w = ds.hw
    for step in range(1, args.steps + 1):
        vi = int(rng.integers(len(batches)))
        vb = batches[vi]
        xs = rng.integers(0, w, R)
        ys = rng.integers(0, h, R)
        raydirs = ds.raydirs(vi, np.stack([xs, ys], -1))
        batch = MVSTrainBatch(
            images=jnp.asarray(vb.images),
            intrinsics=jnp.asarray(vb.intrinsics),
            w2cs=jnp.asarray(vb.w2cs), c2ws=jnp.asarray(vb.c2ws),
            near_far=jnp.asarray(vb.near_far, jnp.float32),
            campos=jnp.asarray(ds.campos(vi)),
            camrotc2w=jnp.asarray(ds.camrotc2w(vi)),
            raydirs=jnp.asarray(raydirs),
            gt_rgb=jnp.asarray(ds.images[vi, ys, xs], jnp.float32))
        state, aux = step_fn(state, batch, jax.random.PRNGKey(step))
        logger.accumulate({k: v for k, v in aux.items()})
        if step % args.print_freq == 0:
            logger.flush(step)
    # export the final generated cloud in the reference checkpoint
    # format (the mode-0 handoff artifact, gen_pnts.py:36-160)
    vb = batches[0]
    gen = generate_points_diff(
        state.mvs, jnp.asarray(vb.images), jnp.asarray(vb.intrinsics),
        jnp.asarray(vb.w2cs), jnp.asarray(vb.c2ws),
        jnp.asarray(vb.near_far, jnp.float32), num_depth=args.num_depth)
    from pointnerf2studio_tpu.models import neural_points as npts
    valid = np.asarray(gen["valid"])
    cloud = npts.from_arrays(
        np.asarray(gen["xyz"])[valid], np.asarray(gen["embedding"])[valid],
        np.asarray(gen["conf"])[valid], np.asarray(gen["dir"])[valid],
        np.asarray(gen["color"])[valid])
    out_path = os.path.join(args.out, f"{args.steps}_net_ray_marching.pth")
    cio.export_torch_checkpoint(state.fields, cloud, out_path)
    print("wrote", out_path)


def cmd_evaluate_images(args):
    """Standalone metrics over rendered-vs-GT PNG directories
    (reference: run/evaluate.py:102-110)."""
    import json

    from pointnerf2studio_tpu.utils.metrics import metrics_over_dirs
    m = metrics_over_dirs(args.pred, args.gt)
    print(json.dumps(m))


def cmd_grow_video(args):
    """Stitch the per-eval-step images a training run saved
    (fit(eval_save_images=True) -> out_dir/evalimg_<step>/eval_NNN.png)
    into a chronological growth video — the reference's
    run/vis_grow_train.py render_grow (:36-60), which assembles
    prob_img_{iter} dumps into grow_video_{vid}.mov/.gif."""
    import glob as _glob

    import imageio
    import numpy as np
    from PIL import Image

    dirs = sorted(_glob.glob(os.path.join(args.run, "evalimg_*")))
    frames = []
    for d in dirs:
        p = os.path.join(d, f"eval_{args.view:03d}.png")
        if os.path.exists(p):
            frames.append(np.asarray(Image.open(p).convert("RGB")))
    if not frames:
        raise SystemExit(
            f"no evalimg_*/eval_{args.view:03d}.png under {args.run} — "
            "train with --eval-images (fit eval_save_images=True)")
    out = args.out or os.path.join(
        args.run, f"grow_video_{args.view:04d}.gif")
    if out.endswith(".gif"):
        imageio.mimwrite(out, frames, duration=1000.0 / args.fps,
                         loop=0)
    else:
        try:
            imageio.mimwrite(out, frames, fps=args.fps, quality=8)
        except (ValueError, ImportError):
            out = os.path.splitext(out)[0] + ".gif"
            imageio.mimwrite(out, frames, duration=1000.0 / args.fps,
                             loop=0)
    print(f"wrote {out} ({len(frames)} frames)")


def cmd_visualize(args):
    """Neural-point-cloud inspection: PLY export + axis projections
    (reference: run/visualize.py pyrender viewer + the visualizer's
    point dumps, utils/visualizer.py:97-121 — headless here: a TPU pod
    has no display, so artifacts are files)."""
    import numpy as np

    from pointnerf2studio_tpu.utils import checkpoint_io as cio

    params, cloud = cio.load_reference_checkpoint(
        _latest_ckpt(args.checkpoint))
    xyz = np.asarray(cloud.xyz)
    alive = np.asarray(cloud.alive)
    color = np.clip(np.asarray(cloud.points_color), 0.0, 1.0)
    conf = np.asarray(cloud.points_conf)[:, 0]
    xyz, color, conf = xyz[alive], color[alive], conf[alive]
    os.makedirs(args.out, exist_ok=True)
    if xyz.shape[0] == 0:
        # freshly-pruned / empty checkpoints: degrade gracefully
        # (empty-array min()/mean() and rng.choice(0) would raise)
        print("0 alive points; skipping stats and projections")
        return

    ply = os.path.join(args.out, "points.ply")
    rgb8 = (color * 255).astype(np.uint8)
    with open(ply, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {xyz.shape[0]}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n")
        f.write(hdr.encode())
        rec = np.zeros(xyz.shape[0],
                       dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
        rec["xyz"], rec["rgb"] = xyz.astype(np.float32), rgb8
        rec.tofile(f)
    print("wrote", ply, f"({xyz.shape[0]} points)")

    # three orthographic scatter projections colored by point color
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for ax, (a, b), name in zip(axes, [(0, 1), (0, 2), (1, 2)],
                                    ["xy", "xz", "yz"]):
            sel = np.random.default_rng(0).choice(
                xyz.shape[0], min(100_000, xyz.shape[0]), replace=False)
            ax.scatter(xyz[sel, a], xyz[sel, b], s=0.1, c=color[sel])
            ax.set_title(name)
            ax.set_aspect("equal")
        out_png = os.path.join(args.out, "projections.png")
        fig.savefig(out_png, dpi=120, bbox_inches="tight")
        print("wrote", out_png)
    except ImportError:
        print("matplotlib unavailable; skipped projections.png")
    print(f"conf: min {conf.min():.3f} mean {conf.mean():.3f} "
          f"max {conf.max():.3f}")


def cmd_edit(args):
    from pointnerf2studio_tpu.edit import load_and_merge_parts
    from pointnerf2studio_tpu.utils import checkpoint_io as cio

    params, merged = load_and_merge_parts(args.parts, args.transforms)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    cio.export_torch_checkpoint(params, merged, args.out)
    print("wrote merged scene:", args.out)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pointnerf2studio_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene", default="chair")
        sp.add_argument("--data", required=True)
        sp.add_argument("--factor", type=int, default=1)
        sp.add_argument("--eval-views", type=int, default=0)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--point-cloud", required=True,
                   help="dir or file with *_net_ray_marching.pth")
    t.add_argument("--out", required=True)
    t.add_argument("--max-steps", type=int, default=None)
    t.add_argument("--rays-per-batch", type=int, default=None)
    t.add_argument("--capacity", type=int, default=None)
    t.add_argument("--eval-freq", type=int, default=0)
    t.add_argument("--num-devices", type=int, default=1)
    t.add_argument("--tensorboard", action="store_true",
                   help="also export scalars as tensorboard events "
                        "(reference visualizer.py:176-182)")
    t.add_argument("--eval-images", action="store_true",
                   help="save eval view renders per eval step "
                        "(evalimg_<step>/ dirs; input to grow-video)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval")
    common(e)
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--out", default=None)
    e.add_argument("--fast", action="store_true",
                   help="fat-cache fast render path (eval semantics)")
    e.set_defaults(fn=cmd_eval)

    v = sub.add_parser("render-video")
    common(v)
    v.add_argument("--checkpoint", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--frames", type=int, default=60)
    v.add_argument("--fast", action="store_true",
                   help="fat-cache fast render path (eval semantics)")
    v.add_argument("--path", choices=("spherical", "interpolate"),
                   default="spherical",
                   help="camera path: spherical orbit, or the "
                        "reference's dataset-pose interpolation "
                        "(mvs_utils.gen_render_path)")
    v.set_defaults(fn=cmd_render_video)

    g = sub.add_parser("gen-points")
    common(g)
    g.add_argument("--out", required=True)
    g.add_argument("--mvsnet-ckpt", default=None)
    g.add_argument("--fpn-ckpt", default=None)
    g.add_argument("--from-ply", default=None,
                   help="init from a COLMAP/PLY point cloud instead of "
                        "running MVSNet")
    g.add_argument("--init-mlp", default=None)
    g.add_argument("--comb-file", default=None,
                   help="';'-delimited txt of extra xyz rows appended "
                        "to the --from-ply cloud (reference --comb_file)")
    g.add_argument("--point-noise", default="",
                   help="jitter loaded positions once at init, e.g. "
                        "pointgaussian_0.1 (reference --point_noise)")
    g.add_argument("--num-src", type=int, default=2)
    g.add_argument("--pairing", default="nearest",
                   choices=("nearest", "triangles"),
                   help="MVS view-triple selection; 'triangles' = the "
                        "reference's camera-rig BPA triangulation")
    g.add_argument("--max-batches", type=int, default=None)
    g.add_argument("--vox-res", type=int, default=320)
    g.add_argument("--capacity", type=int, default=None)
    g.set_defaults(fn=cmd_gen_points)

    tj = sub.add_parser("train-joint",
                        help="joint MVS+render training (reference "
                             "mode 0, learned depth)")
    common(tj)
    tj.add_argument("--out", required=True)
    tj.add_argument("--net-mvs", default=None,
                    help="pretrained best_net_mvs.pth to seed "
                         "FeatureNet/premlp")
    tj.add_argument("--init-mlp", default=None)
    tj.add_argument("--num-src", type=int, default=2)
    tj.add_argument("--mvs-lr", type=float, default=5e-4)
    tj.add_argument("--num-depth", type=int, default=128)
    tj.add_argument("--steps", type=int, default=1000)
    tj.add_argument("--print-freq", type=int, default=50)
    tj.set_defaults(fn=cmd_train_joint)

    ev = sub.add_parser("evaluate-images",
                        help="metrics over rendered/GT PNG dirs")
    ev.add_argument("--pred", required=True)
    ev.add_argument("--gt", required=True)
    ev.set_defaults(fn=cmd_evaluate_images)

    vz = sub.add_parser("visualize",
                        help="export PLY + projection PNG of a "
                             "checkpoint's neural points")
    vz.add_argument("--checkpoint", required=True)
    vz.add_argument("--out", required=True)
    vz.set_defaults(fn=cmd_visualize)

    gv = sub.add_parser(
        "grow-video",
        help="assemble per-eval-step images from a training run into a "
             "growth video (reference run/vis_grow_train.py)")
    gv.add_argument("--run", required=True,
                    help="fit() out dir containing evalimg_* step dirs "
                         "(train with eval_save_images/--eval-images)")
    gv.add_argument("--view", type=int, default=0)
    gv.add_argument("--out", default=None,
                    help="output video path (default "
                         "<run>/grow_video_<view>.gif)")
    gv.add_argument("--fps", type=float, default=3.0)
    gv.set_defaults(fn=cmd_grow_video)

    ed = sub.add_parser("edit")
    ed.add_argument("--parts", nargs="+", required=True)
    ed.add_argument("--transforms", nargs="*", default=None,
                    help="per-part 4x4 .npy transform files")
    ed.add_argument("--out", required=True)
    ed.set_defaults(fn=cmd_edit)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

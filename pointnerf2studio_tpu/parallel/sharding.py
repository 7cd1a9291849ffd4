"""Multi-chip execution: shard the ray axis over a device mesh.

The reference's only parallelism is DDP gradient all-reduce over NCCL
(reference: pointnerf/nerfstudio/studio_pipeline.py:48-53) plus
single-process DataParallel. The TPU-native equivalent (SURVEY.md §2.3):
a 1-D `rays` mesh axis — ray batches are sharded, parameters and the
neural point cloud + voxel grid are replicated per chip (chair-scale
clouds are ~116 MB), and XLA's SPMD partitioner inserts the gradient
all-reduce over ICI automatically. Per-ray work (query, K-NN, MLP,
compositing) is fully local: zero cross-chip traffic in the forward.

TP/PP/EP are deliberately absent — the MLPs total a few MB and there is
no pipeline or expert structure in this model family. The scaling axes
that matter are rays (handled here) and points (a point-sharded gather
path for multi-million-point ScanNet scenes is the planned extension).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.models.render import render_rays
from pointnerf2studio_tpu.train.loss import compute_losses
from pointnerf2studio_tpu.train.trainer import TrainState, make_optimizers

import optax


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), ("rays",))


def make_mesh_2d(n_rays: int, n_points: int) -> Mesh:
    """2-D mesh for ray-parallel x point-parallel execution.

    Chip (i, j) processes ray shard i against point-attribute shard j;
    the neighbor-attribute gather completes with a psum over "points"
    (models/neural_points.py gather_neighbors). Use when the point
    features + Adam moments of a multi-million-point scene exceed one
    chip's HBM headroom (SURVEY.md §6 hard part 6).
    """
    devices = jax.devices()
    n = n_rays * n_points
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(n_rays, n_points),
                ("rays", "points"))


def _points_axis(mesh: Mesh) -> Optional[str]:
    return "points" if "points" in mesh.axis_names else None


def cloud_pspec(sharded: bool):
    """PartitionSpec pytree for a NeuralPointCloud: geometry replicated,
    trainable attribute rows sharded over "points" when requested."""
    from pointnerf2studio_tpu.models.neural_points import NeuralPointCloud
    attr = P("points") if sharded else P()
    return NeuralPointCloud(
        xyz=P(), points_embeding=attr, points_conf=attr,
        points_dir=attr, points_color=attr, Rw2c=P(), alive=P())


def state_pspec(state: TrainState, mesh: Mesh):
    """PartitionSpec pytree matching a TrainState: params + fields-opt
    replicated; point attrs and their Adam moments row-sharded over
    "points" when the mesh has that axis."""
    sharded = _points_axis(mesh) is not None
    cap = state.points.capacity

    def opt_spec(x):
        if (sharded and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] == cap):
            return P("points")
        return P()

    return TrainState(
        params=jax.tree.map(lambda _: P(), state.params),
        points=cloud_pspec(sharded),
        opt_state_fields=jax.tree.map(lambda _: P(), state.opt_state_fields),
        opt_state_points=jax.tree.map(opt_spec, state.opt_state_points),
        step=P(),
    )


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("rays"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def _jit_sharded(fn, mesh, in_specs, out_specs):
    """shard_map + jit with EXPLICIT in/out shardings from the specs.

    Without in_shardings the jit cache keys on the CALLER's concrete
    input shardings: the first call (uncommitted inputs) and the second
    call (inputs that round-tripped through the step's out_specs) key
    differently and each triggers a FULL compile — the r4 dryrun's
    post-prune "cache hit" recompiled for 231 s exactly this way.
    Declaring the shardings makes the key canonical; inputs arriving in
    another layout get resharded (cheap) instead of recompiled."""
    def ns(tree):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree,
                            is_leaf=lambda x: isinstance(x, P))

    in_sh = ns(in_specs)
    jf = jax.jit(_shard_map(fn, mesh, in_specs, out_specs),
                 out_shardings=ns(out_specs))

    def call(*args):
        assert len(args) == len(in_sh), (len(args), len(in_sh))
        # device_put reshards committed arrays (jit's in_shardings
        # would ERROR on them instead); correctly-laid-out inputs are
        # a no-op
        args = jax.device_put(list(args), list(in_sh))
        return jf(*args)

    return call


def make_sharded_render(cfg: PointNerfConfig, mesh: Mesh) -> Callable:
    """Jitted render step with rays sharded over the mesh.

    `shard_map` keeps ALL per-ray work (masking, compaction, K-NN, MLP,
    compositing) device-local — zero collectives in the forward. Points,
    grid and params are replicated per chip.
    """
    pts_axis = _points_axis(mesh)

    def local(params, points, grid, campos, camrotc2w, raydirs, near, far):
        return render_rays(params, points, grid, campos, camrotc2w,
                           raydirs, near, far, cfg, training=False,
                           points_axis=pts_axis)

    return _jit_sharded(
        local, mesh,
        in_specs=(P(), cloud_pspec(pts_axis is not None), P(), P(), P(),
                  P("rays"), P(), P()),
        out_specs=P("rays"))


def make_sharded_fast_render(cfg: PointNerfConfig, mesh: Mesh) -> Callable:
    """Fast-path (fat-cache) render with rays sharded over the mesh.

    The fat cache + params replicate per chip; all per-ray work is
    local (models/fast_render.py). Signature:
    f(params, Rw2c, cache, campos, camrotc2w, raydirs, near, far,
      ranges_min, scaled_vsize) -> FastRenderOutput sharded over rays.
    The scalar exactness counters (win_overflow / dw_overflow), when
    the corresponding reducer is on, are psum'd over the rays axis and
    come back replicated.

    A ONE-device mesh returns the direct jit instead: the degenerate
    shard_map wrapper measured ~65 ms/65k-ray chunk of pure overhead
    on the axon v5e backend (r4d bench 162 -> ~98 ms/chunk after the
    bypass — the whole residual bench-vs-probe gap; PERF.md).
    """
    from pointnerf2studio_tpu.models.fast_render import (
        FastRenderOutput, counter_presence, fast_render_rays)

    if mesh.devices.size == 1:
        def direct(params, Rw2c, cache, campos, camrotc2w, raydirs,
                   near, far, ranges_min, scaled_vsize):
            return fast_render_rays(params, Rw2c, cache, campos,
                                    camrotc2w, raydirs, near, far, cfg,
                                    ranges_min, scaled_vsize)
        return jax.jit(direct)

    q = cfg.query
    has_win, has_dw, has_rb, has_cb, has_mc, has_pb = counter_presence(q)

    def local(params, Rw2c, cache, campos, camrotc2w, raydirs, near, far,
              ranges_min, scaled_vsize):
        out = fast_render_rays(params, Rw2c, cache, campos, camrotc2w,
                               raydirs, near, far, cfg, ranges_min,
                               scaled_vsize)
        return _psum_counters(out)

    out_specs = FastRenderOutput(
        coarse_raycolor=P("rays"), ray_mask=P("rays"), acc=P("rays"),
        depth=P("rays"),
        win_overflow=P() if has_win else None,
        dw_overflow=P() if has_dw else None,
        rb_overflow=P() if has_rb else None,
        cb_overflow=P() if has_cb else None,
        mc_overflow=P() if has_mc else None,
        pb_overflow=P() if has_pb else None,
        n_valid_slots=P())
    return _jit_sharded(
        local, mesh,
        in_specs=(P(), P(), P(), P(), P(), P("rays"), P(), P(), P(), P()),
        out_specs=out_specs)


def _psum_counters(out):
    """Sum a FastRenderOutput's scalar exactness counters over the rays
    axis so they come back replicated (shard_map helpers)."""
    for f in ("win_overflow", "dw_overflow", "rb_overflow",
              "cb_overflow", "mc_overflow", "pb_overflow",
              "n_valid_slots"):
        v = getattr(out, f)
        if v is not None:
            out = out.replace(**{f: jax.lax.psum(v, "rays")})
    return out


def make_sharded_fast_render_pt(cfg: PointNerfConfig,
                                mesh: Mesh) -> Callable:
    """Fast-path render on a 2-D ("rays", "points") mesh with the FAT
    CACHE ROWS sharded over the points axis — for scenes whose
    candidate cache (n_q x cand x 88 B, multi-GB at tens of millions
    of query voxels) exceeds one chip's HBM headroom.

    Device (i, j) renders ray shard i against qslot slab j: the
    front-end (qslot table + compaction) runs on the replicated table,
    each device computes only the slots its slab owns (foreign slots
    mask off and their chunks skip), and ONE psum of the [M] per-slot
    sig/rgb/found reassembles the pipeline — exactly the unsharded
    results (tests/test_sharding.py). Pass cache.rows pre-padded to a
    multiple of the points-axis size (shard_fat_cache). Signature
    matches make_sharded_fast_render."""
    from pointnerf2studio_tpu.models.fast_render import (
        FastRenderOutput, FatCache, counter_presence, fast_render_rays)

    pts = _points_axis(mesh)
    assert pts is not None, "mesh needs a 'points' axis"
    q = cfg.query
    assert q.knn_mode != "fused", (
        "knn_mode='fused' + point-sharded cache not wired yet (the "
        "kernel-facing kmeta/kpay arrays would need the same slab "
        "padding as rows)")
    has_win, has_dw, has_rb, has_cb, has_mc, has_pb = counter_presence(q)

    def local(params, Rw2c, cache, campos, camrotc2w, raydirs, near, far,
              ranges_min, scaled_vsize):
        out = fast_render_rays(params, Rw2c, cache, campos, camrotc2w,
                               raydirs, near, far, cfg, ranges_min,
                               scaled_vsize, pshard_axis=pts)
        return _psum_counters(out)

    cache_specs = FatCache(
        coor_2_qslot=P(), rows=P(pts), n_q=P(),
        coarse_occ=P() if has_win else None,
        march_table=P() if has_mc else None,
        # base-layer table replicated: pidx is global, so local slab
        # gathers stay exact
        base_h=P() if q.base_cache else None)
    out_specs = FastRenderOutput(
        coarse_raycolor=P("rays"), ray_mask=P("rays"), acc=P("rays"),
        depth=P("rays"),
        win_overflow=P() if has_win else None,
        dw_overflow=P() if has_dw else None,
        rb_overflow=P() if has_rb else None,
        cb_overflow=P() if has_cb else None,
        mc_overflow=P() if has_mc else None,
        pb_overflow=P() if has_pb else None,
        n_valid_slots=P())
    return _jit_sharded(
        local, mesh,
        in_specs=(P(), P(), cache_specs, P(), P(), P("rays"), P(), P(),
                  P(), P()),
        out_specs=out_specs)


def shard_fat_cache(cache, mesh: Mesh):
    """Pad cache.rows to a multiple of the points-axis size and place
    it sharded over that axis (everything else replicated). The pad
    rows are empty candidates (meta == -1 bitcast) so they can never
    be selected."""
    pts = _points_axis(mesh)
    npts = mesh.shape[pts]
    n_q = cache.rows.shape[0]
    pad = (-n_q) % npts
    rows = cache.rows
    if pad:
        empty = jnp.broadcast_to(
            jax.lax.bitcast_convert_type(
                jnp.int32(-1), jnp.float32)[None, None],
            (pad, rows.shape[1]))
        rows = jnp.concatenate([rows, empty], 0)
    sh = jax.NamedSharding(mesh, P(pts))
    return cache.replace(rows=jax.device_put(rows, sh))


def make_sharded_fast_train_step(
    cfg: PointNerfConfig, mesh: Mesh, with_bg_ray: bool = False,
) -> Callable:
    """The fast differentiable train path (models/fast_train.py) over a
    1-D rays mesh: geometry cache + points replicated per chip, ray
    batch sharded, grads psum'd over ICI — the fast-path twin of
    make_sharded_train_step. Signature:
    f(state, geo, ranges_min, scaled_vsize, campos, camrotc2w, raydirs,
      gt_rgb, near, far, key[, bg_rgb])."""
    from pointnerf2studio_tpu.models.fast_train import fast_train_render

    tx_f, tx_p = make_optimizers(cfg)

    def local_step(state: TrainState, geo, rmin, svs, campos, camrotc2w,
                   raydirs, gt_rgb, near, far, key, *bg):
        key = jax.random.fold_in(key, jax.lax.axis_index("rays"))
        bg_rgb = bg[0] if bg else None

        def loss_fn(params, point_trainables):
            points = state.points.with_trainable(point_trainables)
            out = fast_train_render(
                params, points, geo, campos, camrotc2w, raydirs,
                near, far, cfg, rmin, svs, key=key, training=True,
                bg_ray_colors=bg_rgb)
            total, aux = compute_losses(
                out, gt_rgb, cfg.train, psum_axis="rays")
            return total, aux

        (_, aux), (g_params, g_points) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.points.trainable())
        g_params = jax.lax.psum(g_params, "rays")
        g_points = jax.lax.psum(g_points, "rays")

        upd_f, opt_f = tx_f.update(g_params, state.opt_state_fields,
                                   state.params)
        params = optax.apply_updates(state.params, upd_f)
        pt = state.points.trainable()
        upd_p, opt_p = tx_p.update(g_points, state.opt_state_points, pt)
        points = state.points.with_trainable(optax.apply_updates(pt, upd_p))
        return state.replace(
            params=params, points=points,
            opt_state_fields=opt_f, opt_state_points=opt_p,
            step=state.step + 1), aux

    return _jit_sharded(
        local_step, mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("rays"), P("rays"),
                  P(), P(), P()) + ((P("rays"),) if with_bg_ray else ()),
        out_specs=(P(), P()))


def make_sharded_train_step(
    cfg: PointNerfConfig, mesh: Mesh,
    example_state: Optional[TrainState] = None,
    with_bg_ray: bool = False,
) -> Callable:
    """Full training step over the mesh.

    Inside `shard_map`: local forward on this chip's ray shard, loss
    sums psum'd over ICI (global masked means), grads of the replicated
    params psum'd — the explicit form of the gradient all-reduce the
    reference got from DDP/NCCL (studio_pipeline.py:48-53). The
    optimizer update runs identically on every chip.

    On a 2-D mesh (make_mesh_2d) the point attributes + their Adam
    moments are additionally row-sharded over "points": each chip
    updates only its shard (its gradient scatter covers exactly its
    rows), so optimizer memory scales down with the axis size.
    `example_state` is required then (to shape the opt-state specs).
    """
    tx_f, tx_p = make_optimizers(cfg)
    pts_axis = _points_axis(mesh)
    if pts_axis is None:
        state_spec = P()
    else:
        if example_state is None:
            raise ValueError("2-D mesh needs example_state for specs")
        state_spec = state_pspec(example_state, mesh)

    def local_step(state: TrainState, grid, campos, camrotc2w, raydirs,
                   gt_rgb, near, far, key, *bg):
        key = jax.random.fold_in(key, jax.lax.axis_index("rays"))
        bg_rgb = bg[0] if bg else None

        def loss_fn(params, point_trainables):
            points = state.points.with_trainable(point_trainables)
            out = render_rays(params, points, grid, campos, camrotc2w,
                              raydirs, near, far, cfg, key=key,
                              training=True, points_axis=pts_axis,
                              bg_ray_colors=bg_rgb)
            total, aux = compute_losses(
                out, gt_rgb, cfg.train, psum_axis="rays")
            return total, aux

        (_, aux), (g_params, g_points) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.points.trainable())
        # loss sums are already global (psum inside the loss), so
        # grads w.r.t. the replicated tensors only need the psum.
        g_params = jax.lax.psum(g_params, "rays")
        g_points = jax.lax.psum(g_points, "rays")

        upd_f, opt_f = tx_f.update(g_params, state.opt_state_fields,
                                   state.params)
        params = optax.apply_updates(state.params, upd_f)
        pt = state.points.trainable()
        upd_p, opt_p = tx_p.update(g_points, state.opt_state_points, pt)
        points = state.points.with_trainable(optax.apply_updates(pt, upd_p))
        new_state = state.replace(
            params=params, points=points,
            opt_state_fields=opt_f, opt_state_points=opt_p,
            step=state.step + 1)
        return new_state, aux

    return _jit_sharded(
        local_step, mesh,
        in_specs=(state_spec, P(), P(), P(), P("rays"), P("rays"),
                  P(), P(), P()) + ((P("rays"),) if with_bg_ray else ()),
        out_specs=(state_spec, P()))

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


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("rays"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def make_sharded_render(cfg: PointNerfConfig, mesh: Mesh) -> Callable:
    """Jitted render step with rays sharded over the mesh.

    `shard_map` keeps ALL per-ray work (masking, compaction, K-NN, MLP,
    compositing) device-local — zero collectives in the forward. Points,
    grid and params are replicated per chip.
    """
    def local(params, points, grid, campos, camrotc2w, raydirs, near, far):
        return render_rays(params, points, grid, campos, camrotc2w,
                           raydirs, near, far, cfg, training=False)

    fn = _shard_map(
        local, mesh,
        in_specs=(P(), P(), P(), P(), P(), P("rays"), P(), P()),
        out_specs=P("rays"))
    return jax.jit(fn)


def make_sharded_train_step(cfg: PointNerfConfig, mesh: Mesh) -> Callable:
    """Full training step over the mesh.

    Inside `shard_map`: local forward on this chip's ray shard, loss
    sums psum'd over ICI (global masked means), grads of the replicated
    params psum'd — the explicit form of the gradient all-reduce the
    reference got from DDP/NCCL (studio_pipeline.py:48-53). The
    optimizer update runs identically on every chip.
    """
    tx_f, tx_p = make_optimizers(cfg)

    def local_step(state: TrainState, grid, campos, camrotc2w, raydirs,
                   gt_rgb, near, far, key):
        def loss_fn(params, point_trainables):
            points = state.points.with_trainable(point_trainables)
            out = render_rays(params, points, grid, campos, camrotc2w,
                              raydirs, near, far, cfg, key=key, training=True)
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

    fn = _shard_map(
        local_step, mesh,
        in_specs=(P(), P(), P(), P(), P("rays"), P("rays"), P(), P(), P()),
        out_specs=(P(), P()))
    return jax.jit(fn)

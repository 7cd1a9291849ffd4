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
from pointnerf2studio_tpu.train.loss import compute_loss
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


def make_sharded_render(cfg: PointNerfConfig, mesh: Mesh) -> Callable:
    """Jitted render step with rays sharded over the mesh.

    Points/grid/params replicated; output colors sharded like the rays.
    """
    rs, rep = ray_sharding(mesh), replicated(mesh)

    def fn(params, points, grid, campos, camrotc2w, raydirs, near, far):
        return render_rays(params, points, grid, campos, camrotc2w,
                           raydirs, near, far, cfg, training=False)

    return jax.jit(
        fn,
        in_shardings=(rep, rep, rep, rep, rep, rs, rep, rep),
        out_shardings=rs,
    )


def make_sharded_train_step(cfg: PointNerfConfig, mesh: Mesh) -> Callable:
    """Full training step jitted over the mesh.

    Rays + ground truth sharded on the `rays` axis; state replicated.
    The SPMD partitioner turns the replicated-param gradients into a
    `psum` over ICI — the collective the reference got from DDP/NCCL.
    """
    tx_f, tx_p = make_optimizers(cfg)
    rs, rep = ray_sharding(mesh), replicated(mesh)

    def step(state: TrainState, grid, campos, camrotc2w, raydirs,
             gt_rgb, near, far, key):
        def loss_fn(params, point_trainables):
            points = state.points.with_trainable(point_trainables)
            out = render_rays(params, points, grid, campos, camrotc2w,
                              raydirs, near, far, cfg, key=key, training=True)
            total, aux = compute_loss(
                out, gt_rgb,
                zero_epsilon=cfg.train.zero_epsilon,
                zero_one_weight=cfg.train.zero_one_loss_weight)
            return total, aux

        (_, aux), (g_params, g_points) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.points.trainable())

        upd_f, opt_f = tx_f.update(g_params, state.opt_state_fields, state.params)
        params = optax.apply_updates(state.params, upd_f)
        pt = state.points.trainable()
        upd_p, opt_p = tx_p.update(g_points, state.opt_state_points, pt)
        points = state.points.with_trainable(optax.apply_updates(pt, upd_p))
        new_state = state.replace(
            params=params, points=points,
            opt_state_fields=opt_f, opt_state_points=opt_p,
            step=state.step + 1)
        return new_state, aux

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, rep, rs, rs, rep, rep, rep),
        out_shardings=(rep, rep),
    )

"""Training state + jitted train step.

Two optimizer groups with per-step exponential lr decay, matching the
reference trainer config (pointnerf/nerfstudio/studio_config.py:33-48
and the scheduler at studio_utils.py:33-44):
  * "fields"        — the MLP tower params, Adam lr 5e-4
  * "neural_points" — point features/conf/dir/color, Adam lr 2e-3
  * lr(t) = lr0 * 0.1^(t / 1_000_000), continuous

The point cloud's xyz/Rw2c/alive are frozen (reference freezes xyz and
Rw2c: studio_utils.py:92-103); prune/grow mutate them outside the
jitted step (see models/neural_points.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.models.aggregator import AggregatorParams
from pointnerf2studio_tpu.models.neural_points import NeuralPointCloud
from pointnerf2studio_tpu.models.render import render_rays
from pointnerf2studio_tpu.ops.grid import PointGrid
from pointnerf2studio_tpu.train.loss import compute_losses


@struct.dataclass
class TrainState:
    params: AggregatorParams
    points: NeuralPointCloud
    opt_state_fields: Any
    opt_state_points: Any
    step: jnp.ndarray


def make_optimizers(cfg: PointNerfConfig) -> Tuple[optax.GradientTransformation,
                                                   optax.GradientTransformation]:
    t = cfg.train
    # With alter_step alternation each optimizer steps only half the
    # iterations, but the reference decays lr by GLOBAL step (its
    # scheduler ticks every iteration regardless of which optimizer
    # stepped) — optax schedules count optimizer updates, so halve the
    # transition span to keep lr(global_step) aligned.
    mult = 2 if t.alter_step > 0 else 1

    def sched(lr0):
        return optax.exponential_decay(
            init_value=lr0, transition_steps=max(t.lr_decay_iters // mult, 1),
            decay_rate=t.lr_decay_exp, staircase=False)

    return (optax.adam(sched(t.lr_fields)),
            optax.adam(sched(t.lr_points)))


def create_train_state(
    params: AggregatorParams,
    points: NeuralPointCloud,
    cfg: PointNerfConfig,
) -> TrainState:
    tx_f, tx_p = make_optimizers(cfg)
    return TrainState(
        params=params,
        points=points,
        opt_state_fields=tx_f.init(params),
        opt_state_points=tx_p.init(points.trainable()),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: PointNerfConfig) -> Callable:
    """Jitted train step; near/far passed per batch (scene-dependent)."""
    tx_f, tx_p = make_optimizers(cfg)

    @jax.jit
    def train_step(
        state: TrainState,
        grid: PointGrid,
        campos: jnp.ndarray,
        camrotc2w: jnp.ndarray,
        raydirs: jnp.ndarray,
        gt_rgb: jnp.ndarray,
        near: jnp.ndarray,
        far: jnp.ndarray,
        key: jax.Array,
        bg_rgb: jnp.ndarray | None = None,   # [R, 3] plane bg (bgmodel)
        gt_mask: jnp.ndarray | None = None,  # [R] fg/depth-valid mask
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:

        def loss_fn(params, point_trainables):
            points = state.points.with_trainable(point_trainables)
            out = render_rays(
                params, points, grid, campos, camrotc2w, raydirs,
                near=near, far=far, cfg=cfg, key=key, training=True,
                bg_ray_colors=bg_rgb)
            total, aux = compute_losses(out, gt_rgb, cfg.train,
                                        gt_mask=gt_mask)
            return total, aux

        (_, aux), (g_params, g_points) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.points.trainable())

        alt = cfg.train.alter_step
        pt = state.points.trainable()
        if alt > 0:
            # Alternate optimizers (reference backward,
            # neural_points_volumetric_model.py:204-211): the skipped
            # group keeps its params AND Adam moments untouched, like a
            # torch optimizer whose .step() wasn't called.
            phase = (state.step // alt) % 2

            def step_fields(_):
                u, o = tx_f.update(g_params, state.opt_state_fields,
                                   state.params)
                return optax.apply_updates(state.params, u), o

            def step_points(_):
                u, o = tx_p.update(g_points, state.opt_state_points, pt)
                return optax.apply_updates(pt, u), o

            params, opt_f = jax.lax.cond(
                phase == 0, step_fields,
                lambda _: (state.params, state.opt_state_fields), None)
            new_pt, opt_p = jax.lax.cond(
                phase == 1, step_points,
                lambda _: (pt, state.opt_state_points), None)
            points = state.points.with_trainable(new_pt)
        else:
            upd_f, opt_f = tx_f.update(g_params, state.opt_state_fields,
                                       state.params)
            params = optax.apply_updates(state.params, upd_f)
            upd_p, opt_p = tx_p.update(g_points, state.opt_state_points, pt)
            points = state.points.with_trainable(
                optax.apply_updates(pt, upd_p))

        new_state = state.replace(
            params=params, points=points,
            opt_state_fields=opt_f, opt_state_points=opt_p,
            step=state.step + 1)
        return new_state, aux

    return train_step

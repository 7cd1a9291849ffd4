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

    def sched(lr0):
        return optax.exponential_decay(
            init_value=lr0, transition_steps=t.lr_decay_iters,
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
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:

        def loss_fn(params, point_trainables):
            points = state.points.with_trainable(point_trainables)
            out = render_rays(
                params, points, grid, campos, camrotc2w, raydirs,
                near=near, far=far, cfg=cfg, key=key, training=True)
            total, aux = compute_losses(out, gt_rgb, cfg.train)
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

    return train_step

"""Point growing: probe rendered frames for holes, add points there.

Mirror of the reference's `probe_hole`
(reference: pointnerf/run/train_ft.py:417-530): render probe frames in
prob mode, find pixels where the model missed (ray_mask == 0) but the
ground truth is not background, dilate that miss mask by 1 px, and at
neighboring HIT pixels with high max-shading-opacity spawn new points
at the max-opacity sample location, carrying conf/color/dir/embedding
averages from the local neighbors (prob-mode render outputs).

Unlike the reference — which exits the process after growth and relies
on the shell script to restart (train_ft.py:911) — growth here writes
into free point slots (static capacity) and resets the grown slots'
Adam moments in place.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.data.blender import BlenderDataset
from pointnerf2studio_tpu.models import neural_points as npts
from pointnerf2studio_tpu.models.render import render_rays
from pointnerf2studio_tpu.ops.grid import PointGrid, build_grid_from_points
from pointnerf2studio_tpu.train.trainer import TrainState


def _dilate1(mask: np.ndarray) -> np.ndarray:
    """Binary dilation by 1 pixel (bloat_inds equivalent)."""
    out = mask.copy()
    out[1:] |= mask[:-1]
    out[:-1] |= mask[1:]
    out[:, 1:] |= mask[:, :-1]
    out[:, :-1] |= mask[:, 1:]
    return out


def probe_view(
    cfg: PointNerfConfig, params, points, grid,
    dataset: BlenderDataset, view: int,
    chunk: int = 4096,
    opacity_thresh: float = 0.7,
    prob_mul: float = 1.0,
    bg_eps: float = 0.002,
) -> Dict[str, np.ndarray]:
    """Probe one view -> candidate new-point arrays (may be empty)."""
    h, w = dataset.hw
    rays = dataset.full_image_rays(view)
    total = h * w
    padded = (total + chunk - 1) // chunk * chunk
    rays_p = np.pad(rays, ((0, padded - total), (0, 0)))

    # params/points/grid are ARGUMENTS, not closure captures: captured
    # arrays ship as constants to the (remote) compiler — at real
    # scene scale that is hundreds of MB and the compile request dies
    # with HTTP 413 (hit by the 150k-point validate800 run; STATUS.md
    # measurement rule 2)
    fn = jax.jit(lambda p, pts, g, rd: render_rays(
        p, pts, g, jnp.asarray(dataset.campos(view)),
        jnp.asarray(dataset.camrotc2w(view)), rd,
        jnp.asarray(dataset.near), jnp.asarray(dataset.far),
        cfg, prob=True))

    keys = ("ray_mask", "ray_max_shading_opacity", "ray_max_sample_loc_w",
            "shading_avg_color", "shading_avg_dir", "shading_avg_conf",
            "shading_avg_embedding")
    maps = {k: [] for k in keys}
    for i in range(0, padded, chunk):
        out = fn(params, points, grid, jnp.asarray(rays_p[i:i + chunk]))
        for k in keys:
            maps[k].append(np.asarray(getattr(out, k)))
    maps = {k: np.concatenate(v)[:total] for k, v in maps.items()}

    gt = dataset.images[view].reshape(h, w, 3)
    bg = np.asarray(cfg.bg_color, np.float32)
    ray_mask = maps["ray_mask"].reshape(h, w)
    miss = (~ray_mask) & (np.linalg.norm(gt - bg, axis=-1) > bg_eps)
    near_miss = _dilate1(miss)
    grow_mask = (ray_mask & near_miss
                 & (maps["ray_max_shading_opacity"].reshape(h, w)
                    > opacity_thresh))
    sel = grow_mask.reshape(-1)
    return {
        "xyz": maps["ray_max_sample_loc_w"][sel],
        "embedding": maps["shading_avg_embedding"][sel],
        "color": maps["shading_avg_color"][sel],
        "dir": maps["shading_avg_dir"][sel],
        "conf": maps["shading_avg_conf"][sel] * prob_mul,
    }


def reset_point_opt_slots(opt_state, slots: np.ndarray):
    """Zero Adam moments at grown slots (their history belonged to a
    previously pruned point). `slots` is an index array into N."""
    idx = jnp.asarray(slots)

    def zero_rows(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.dtype.kind == "f":
            return x.at[idx].set(0.0)
        return x

    return jax.tree.map(zero_rows, opt_state)


def expand_state_capacity(state: TrainState,
                          new_capacity: int) -> TrainState:
    """Re-pad the point cloud AND its Adam moments to `new_capacity`
    rows (SURVEY §7 capacity doubling). Leaves whose leading dim equals
    the old capacity (the per-point mu/nu moments) get zero rows; the
    fields group is untouched."""
    cap = state.points.capacity
    pad = new_capacity - cap

    def padrow(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    return state.replace(
        points=npts.expand_capacity(state.points, new_capacity),
        opt_state_points=jax.tree.map(padrow, state.opt_state_points),
    )


def probe_and_grow(
    cfg: PointNerfConfig,
    state: TrainState,
    grid: PointGrid,
    dataset: BlenderDataset,
    views: Optional[List[int]] = None,
    chunk: int = 4096,
    opacity_thresh: float = 0.7,
    prob_mul: float = 1.0,
    allow_expand: bool = True,
    capacity_round: int = 4096,
) -> Tuple[TrainState, PointGrid, int]:
    """Probe views, grow points into free slots, rebuild the grid.

    When candidates exceed free slots and `allow_expand`, capacity is
    grown first — to at least double, rounded up to `capacity_round` —
    and the cloud + Adam moments are re-padded (one recompile of the
    train step). With expansion off, the overflow is DROPPED and
    reported, never silent."""
    views = views if views is not None else list(range(dataset.num_views))
    parts = [probe_view(cfg, state.params, state.points, grid, dataset, v,
                        chunk=chunk, opacity_thresh=opacity_thresh,
                        prob_mul=prob_mul) for v in views]
    xyz = np.concatenate([p["xyz"] for p in parts], 0)
    if xyz.shape[0] == 0:
        return state, grid, 0

    n_alive = int(np.asarray(state.points.num_alive))
    free = state.points.capacity - n_alive
    if xyz.shape[0] > free:
        if allow_expand:
            need = n_alive + xyz.shape[0]
            new_cap = max(2 * state.points.capacity, need)
            new_cap = -(-new_cap // capacity_round) * capacity_round
            print(f"grow: {xyz.shape[0]} candidates > {free} free slots; "
                  f"expanding capacity {state.points.capacity} -> {new_cap}")
            state = expand_state_capacity(state, new_cap)
        else:
            print(f"grow: DROPPING {xyz.shape[0] - free} of "
                  f"{xyz.shape[0]} candidates (capacity saturated, "
                  f"expansion disabled)")

    alive_before = np.asarray(state.points.alive)
    points = npts.grow(
        state.points,
        jnp.asarray(xyz),
        jnp.asarray(np.concatenate([p["embedding"] for p in parts], 0)),
        jnp.asarray(np.concatenate([p["conf"] for p in parts], 0)),
        jnp.asarray(np.concatenate([p["dir"] for p in parts], 0)),
        jnp.asarray(np.concatenate([p["color"] for p in parts], 0)),
        jnp.ones((xyz.shape[0],), bool))
    grown = np.flatnonzero(np.asarray(points.alive) & ~alive_before)
    opt_p = reset_point_opt_slots(state.opt_state_points, grown)
    state = state.replace(points=points, opt_state_points=opt_p)
    grid = build_grid_from_points(points.xyz, points.alive, cfg.query)
    return state, grid, int(grown.shape[0])

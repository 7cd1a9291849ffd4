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

import functools
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


@functools.lru_cache(maxsize=8)
def _probe_render_fn(cfg: PointNerfConfig):
    """One jitted prob-mode renderer per cfg (frozen dataclass, so it
    hashes); pose and clip planes are runtime arguments."""
    @jax.jit
    def fn(p, pts, g, campos, camrot, near, far, rd):
        return render_rays(p, pts, g, campos, camrot, rd, near, far,
                           cfg, prob=True)
    return fn


def probe_cfg(cfg: PointNerfConfig) -> PointNerfConfig:
    """The FAST prob-mode probe's query config: the plain topk-packed
    chunk pipeline with every front-end reducer stripped.

    - march/rb/span/dw budgets were planned for TRAINING batches
      (pixel-sampled, frame-average density); probe chunks are
      raster-order full-image slices whose center chunks run ~2.4x
      average density, so those static budgets would silently drop
      probe samples.
    - compact_budget = the per-ray slot cap, so cb_overflow cannot
      drop slots at any density (has_cb_overflow -> None).
    - prob-mode neighbor averages need the default XLA decode path
      (chunk_pipeline want_attrs guard)."""
    import dataclasses
    q = cfg.query
    BP = q.ray_slot_budget or min(q.SR, 32)
    return dataclasses.replace(cfg, query=dataclasses.replace(
        q, march_steps=(), march_buckets=(), ray_budget=0,
        span_tiers=(), span_tier_budgets=(), depth_window=0,
        coarse_step=0, knn_mode="xla", chunk_mode="xla",
        decode_mode="lanes", extract_mode="onehot",
        compact_budget=min(q.SR, BP), use_cache=False))


def make_probe_scene(cfg: PointNerfConfig, params, points, grid,
                     near, far):
    """(cfg_p, cache, rmin, svs) for fast prob-mode probes — ONE fat
    cache per growth event, shared by every probe view (VERDICT r4
    #3i: the legacy prob-mode render's remote compile at scene scale
    is the known 50+ min pathology; the fast path compiles the same
    ~40 s program family the training loop already uses)."""
    from pointnerf2studio_tpu.models.fast_render import make_fast_scene
    cfg_p = probe_cfg(cfg)
    cache, rmin, svs = make_fast_scene(cfg_p, points, grid, near=near,
                                       far=far, params=params)
    return cfg_p, cache, rmin, svs


def probe_view(
    cfg: PointNerfConfig, params, points, grid,
    dataset: BlenderDataset, view: int,
    chunk: int = 4096,
    opacity_thresh: float = 0.7,
    prob_mul: float = 1.0,
    bg_eps: float = 0.002,
    fast_scene=None,      # make_probe_scene result -> fast prob path
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
    # measurement rule 2). The jitted renderer is cached per cfg —
    # camera pose/near/far are arguments too, so repeated probe events
    # across views and training steps reuse ONE compiled program.
    from pointnerf2studio_tpu.ops.grid import localize_tree_for_build
    # the probe is a small chunked render: run it on ONE device even
    # when params/points arrive committed to a live training mesh
    # (mixed-device args are a jit error; n-way replicated execution
    # of the probe would also be pure waste)
    campos = jnp.asarray(dataset.campos(view))
    camrot = jnp.asarray(dataset.camrotc2w(view))
    near_j = jnp.asarray(dataset.near)
    far_j = jnp.asarray(dataset.far)

    keys = ("ray_mask", "ray_max_shading_opacity", "ray_max_sample_loc_w",
            "shading_avg_color", "shading_avg_dir", "shading_avg_conf",
            "shading_avg_embedding")
    maps = {k: [] for k in keys}
    if fast_scene is not None:
        from pointnerf2studio_tpu.models.fast_render import (
            fast_render_rays_jit)
        cfg_p, cache, rmin, svs = fast_scene
        params, Rw2c = localize_tree_for_build((params, points.Rw2c))
        rmin_j, svs_j = jnp.asarray(rmin), jnp.asarray(svs)
        for i in range(0, padded, chunk):
            out = fast_render_rays_jit(
                params, Rw2c, cache, campos, camrot,
                jnp.asarray(rays_p[i:i + chunk]), near_j, far_j,
                cfg_p, rmin_j, svs_j, prob=True)
            for k in keys:
                maps[k].append(np.asarray(jax.device_get(
                    getattr(out, k))))
    else:
        params, points, grid = localize_tree_for_build(
            (params, points, grid))
        fn = _probe_render_fn(cfg)
        for i in range(0, padded, chunk):
            out = fn(params, points, grid, campos, camrot, near_j,
                     far_j, jnp.asarray(rays_p[i:i + chunk]))
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


@jax.jit
def reset_point_opt_slots(opt_state, slots):
    """Zero Adam moments at grown slots (their history belonged to a
    previously pruned point). `slots` is an index array into N —
    bucket-padded by the caller (pad_grow_count) so growth events with
    similar counts reuse ONE compiled program; padding entries are
    out-of-range sentinels dropped by the scatter.

    Jitted as ONE program: the eager tree.map form dispatches one
    distributed scatter per moment leaf, which dominates grow wall
    time on sharded state (dryrun r4 decomposition)."""
    idx = jnp.asarray(slots)

    def zero_rows(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.dtype.kind == "f":
            return x.at[idx].set(0.0, mode="drop")
        return x

    return jax.tree.map(zero_rows, opt_state)


def pad_grow_count(m: int, bucket: int = 256) -> int:
    """Round a growth-event size up to a compile bucket (ADVICE r4:
    variable-length grow/reset index arrays retraced + recompiled on
    EVERY event with a new count — expensive on the remote compiler
    and unbounded over a long run)."""
    return max(bucket, -(-m // bucket) * bucket)


@functools.partial(jax.jit, static_argnums=(1,))
def expand_state_capacity(state: TrainState,
                          new_capacity: int) -> TrainState:
    """Re-pad the point cloud AND its Adam moments to `new_capacity`
    rows (SURVEY §7 capacity doubling). Leaves whose leading dim equals
    the old capacity (the per-point mu/nu moments) get zero rows; the
    fields group is untouched. Jitted (see reset_point_opt_slots)."""
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
    # FAST prob-mode probes by default (VERDICT r4 #3i): one fat cache
    # per growth event, one ~40 s-class compiled program reused across
    # events — instead of the legacy prob render whose remote compile
    # at scene scale is the measured 50+ min pathology (STATUS.md r4).
    # PN2S_LEGACY_PROBE=1 falls back to the legacy path.
    import os
    fast_scene = None
    if os.environ.get("PN2S_LEGACY_PROBE", "0") != "1":
        try:
            fast_scene = make_probe_scene(
                cfg, state.params, state.points, grid,
                near=dataset.near, far=dataset.far)
        except Exception as e:    # probe must never kill training
            print(f"grow: fast probe scene failed ({e}); legacy probe")
    parts = [probe_view(cfg, state.params, state.points, grid, dataset, v,
                        chunk=chunk, opacity_thresh=opacity_thresh,
                        prob_mul=prob_mul, fast_scene=fast_scene)
             for v in views]
    del fast_scene    # free the probe fat cache before the geo rebuild
                      # (the r4 hole run RESOURCE_EXHAUSTed right after
                      # a probe event, logs_r4/queue_r4c.log:509-534)
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
    # bucket-pad the candidate batch (ADVICE r4): every distinct M
    # would otherwise trace + remote-compile a fresh grow program;
    # padding rows carry valid=False and are never placed
    m = xyz.shape[0]
    mp = pad_grow_count(m)

    def padm(a):
        a = np.asarray(a)
        return jnp.asarray(np.pad(a, ((0, mp - m),) + ((0, 0),)
                                  * (a.ndim - 1)))

    valid = np.zeros((mp,), bool)
    valid[:m] = True
    points = npts.grow(
        state.points,
        padm(xyz),
        padm(np.concatenate([p["embedding"] for p in parts], 0)),
        padm(np.concatenate([p["conf"] for p in parts], 0)),
        padm(np.concatenate([p["dir"] for p in parts], 0)),
        padm(np.concatenate([p["color"] for p in parts], 0)),
        jnp.asarray(valid))
    grown = np.flatnonzero(np.asarray(points.alive) & ~alive_before)
    # same bucketing for the moment-reset index array (sentinel
    # indices are out of range -> dropped by the jitted scatter)
    gp = np.full((pad_grow_count(max(grown.shape[0], 1)),), 2 ** 30,
                 np.int64)
    gp[:grown.shape[0]] = grown
    opt_p = reset_point_opt_slots(state.opt_state_points, gp)
    state = state.replace(points=points, opt_state_points=opt_p)
    grid = build_grid_from_points(points.xyz, points.alive, cfg.query)
    return state, grid, int(grown.shape[0])

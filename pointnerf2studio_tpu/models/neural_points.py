"""Neural point cloud: the trainable point store.

TPU-native counterpart of the reference `NeuralPoints` modules
(reference: pointnerf/nerfstudio/studio_utils.py:71-209 and
pointnerf/models/neural_points/neural_points.py:11-723).

Static-capacity design: arrays are allocated at `capacity` slots with an
`alive` mask. Pruning clears mask bits; growing writes into free slots
(reference rebuilds optimizers and restarts the process instead,
run/train_ft.py:911). Shapes never change during training, so the
jitted train step survives prune/grow without recompiling.

Per-point attributes (names match the reference checkpoint keys at
`neural_points.*`): xyz [N,3] (frozen), points_embeding [N,C],
points_conf [N,1], points_dir [N,3], points_color [N,3], and a global
or per-point Rw2c rotation (per-point appears after scene editing).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class NeuralPointCloud:
    xyz: jnp.ndarray              # [N, 3] float32 (not optimized)
    points_embeding: jnp.ndarray  # [N, C] float32
    points_conf: jnp.ndarray      # [N, 1]
    points_dir: jnp.ndarray       # [N, 3]
    points_color: jnp.ndarray     # [N, 3]
    Rw2c: jnp.ndarray             # [3, 3] global or [N, 3, 3] per-point
    alive: jnp.ndarray            # [N] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def trainable(self) -> Dict[str, jnp.ndarray]:
        """The point attributes optimized by the `neural_points` group."""
        return {
            "points_embeding": self.points_embeding,
            "points_conf": self.points_conf,
            "points_dir": self.points_dir,
            "points_color": self.points_color,
        }

    def with_trainable(self, t: Dict[str, jnp.ndarray]) -> "NeuralPointCloud":
        return self.replace(**t)


def from_arrays(
    xyz: np.ndarray,
    points_embeding: np.ndarray,
    points_conf: np.ndarray,
    points_dir: np.ndarray,
    points_color: np.ndarray,
    Rw2c: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
) -> NeuralPointCloud:
    """Build a point cloud, padding to `capacity` slots (dead by default)."""
    n = xyz.shape[0]
    cap = capacity or n

    def pad(a):
        a = np.asarray(a, np.float32).reshape(n, -1)
        if cap == n:
            return jnp.asarray(a)
        return jnp.asarray(np.pad(a, ((0, cap - n), (0, 0))))

    alive = jnp.asarray(np.arange(cap) < n)
    if Rw2c is None:
        Rw2c = np.eye(3, dtype=np.float32)
    return NeuralPointCloud(
        xyz=pad(xyz),
        points_embeding=pad(points_embeding),
        points_conf=pad(points_conf),
        points_dir=pad(points_dir),
        points_color=pad(points_color),
        Rw2c=jnp.asarray(np.asarray(Rw2c, np.float32)),
        alive=alive,
    )


def gather_neighbors(
    points: NeuralPointCloud,
    sample_pidx: jnp.ndarray,   # [R, SR, K] int32, -1 = empty
    points_axis: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Gather per-neighbor attributes into padded [R, SR, K, .] tensors.

    Mirrors the index_select block in the reference forward
    (studio_utils.py:199-207): invalid slots gather point 0 (indices are
    clamped) and must be masked downstream via `sample_pidx >= 0`.

    With `points_axis` set (inside `shard_map` over a mesh with that
    axis), the trainable attribute tensors are ROW-SHARDED over the
    axis while xyz/Rw2c/the indices stay replicated: each chip gathers
    the rows it owns (masked) and one `psum` completes the gather —
    point-parallelism for clouds whose features + Adam moments exceed
    one chip's HBM (SURVEY.md §2.3). The psum transpose is a broadcast,
    so gradients flow back as local scatter-adds into each chip's
    shard with no extra collective.
    """
    idx = jnp.clip(sample_pidx, 0, points.capacity - 1)
    out = {"xyz": points.xyz[idx]}
    if points_axis is None:
        # one packed gather instead of four — XLA/TPU gathers cost per
        # row, so fusing the attribute columns quarters the row count
        c = points.points_embeding.shape[-1]
        packed = jnp.concatenate(
            [points.points_embeding, points.points_conf,
             points.points_dir, points.points_color], axis=-1)
        vals = packed[idx]
        out.update(
            embeding=vals[..., :c],
            conf=vals[..., c:c + 1],
            dir=vals[..., c + 1:c + 4],
            color=vals[..., c + 4:c + 7],
        )
    else:
        n_local = points.points_embeding.shape[0]
        off = jax.lax.axis_index(points_axis) * n_local
        loc = sample_pidx - off
        own = (loc >= 0) & (loc < n_local)
        li = jnp.clip(loc, 0, n_local - 1)
        packed = jnp.concatenate(
            [points.points_embeding, points.points_conf,
             points.points_dir, points.points_color], axis=-1)
        vals = packed[li] * own[..., None].astype(packed.dtype)
        vals = jax.lax.psum(vals, points_axis)
        c = points.points_embeding.shape[-1]
        out.update(
            embeding=vals[..., :c],
            conf=vals[..., c:c + 1],
            dir=vals[..., c + 1:c + 4],
            color=vals[..., c + 4:c + 7],
        )
    if points.Rw2c.ndim == 3:
        out["Rw2c"] = points.Rw2c[idx]
    return out


@jax.jit
def prune(points: NeuralPointCloud, conf_thresh: float) -> NeuralPointCloud:
    """Kill points whose confidence fell below `conf_thresh`.

    Reference: `NeuralPoints.prune`
    (models/neural_points/neural_points.py:341-364) — there it shrinks
    tensors and forces an optimizer rebuild; here only the mask changes.

    Jitted: on a sharded cloud (the 2-D rays x points mesh) the eager
    form dispatches one distributed program per jnp op, which dominates
    structure-change wall time on small hosts (dryrun r4 decomposition).
    """
    keep = points.alive & (points.points_conf[:, 0] >= conf_thresh)
    return points.replace(alive=keep)


@jax.jit
def grow(
    points: NeuralPointCloud,
    new_xyz: jnp.ndarray,          # [M, 3]
    new_embeding: jnp.ndarray,     # [M, C]
    new_conf: jnp.ndarray,         # [M, 1]
    new_dir: jnp.ndarray,          # [M, 3]
    new_color: jnp.ndarray,        # [M, 3]
    new_valid: jnp.ndarray,        # [M] bool — which candidates are real
) -> NeuralPointCloud:
    """Write up to M new points into free (dead) slots.

    Reference: `NeuralPoints.grow_points` concatenates tensors
    (neural_points.py:367-393); here dead slots are recycled so shapes
    stay static. Candidates beyond the free-slot budget are dropped
    (fixed capacity is part of the design contract; choose `capacity`
    with growth headroom).
    """
    cap = points.capacity
    m = new_xyz.shape[0]
    # Rank free slots: dead slots get their position, live ones sink.
    dead = ~points.alive
    free_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1          # per slot
    # For each candidate i, target slot = i-th dead slot.
    order = jnp.argsort(~dead, stable=True)                     # dead first
    target = order[:m] if m <= cap else order[: cap]
    n_free = jnp.sum(dead.astype(jnp.int32))
    can_place = new_valid[: target.shape[0]] & (
        jnp.arange(target.shape[0]) < n_free)
    safe_target = jnp.where(can_place, target, cap)             # cap = drop

    def put(dst, src):
        src = src[: target.shape[0]]
        return dst.at[safe_target].set(src, mode="drop")

    return points.replace(
        xyz=put(points.xyz, new_xyz),
        points_embeding=put(points.points_embeding, new_embeding),
        points_conf=put(points.points_conf, new_conf),
        points_dir=put(points.points_dir, new_dir),
        points_color=put(points.points_color, new_color),
        alive=points.alive.at[safe_target].set(True, mode="drop"),
    )


@functools.partial(jax.jit, static_argnums=(1,))
def expand_capacity(points: NeuralPointCloud,
                    new_capacity: int) -> NeuralPointCloud:
    """Re-pad every per-point array to `new_capacity` slots (dead).

    Growth beyond the free-slot budget triggers this (SURVEY §7
    "static capacity + doubling"); shapes change, so the jitted train
    step recompiles once per expansion. Jitted (one program, not one
    eager pad dispatch per field — see prune())."""
    cap = points.capacity
    if new_capacity < cap:
        raise ValueError(f"cannot shrink capacity {cap} -> {new_capacity}")
    if new_capacity == cap:
        return points
    pad = new_capacity - cap

    def padrow(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    return points.replace(
        xyz=padrow(points.xyz),
        points_embeding=padrow(points.points_embeding),
        points_conf=padrow(points.points_conf),
        points_dir=padrow(points.points_dir),
        points_color=padrow(points.points_color),
        Rw2c=padrow(points.Rw2c) if points.Rw2c.ndim == 3 else points.Rw2c,
        alive=jnp.pad(points.alive, (0, pad)),
    )


def init_features(
    key, xyz: jnp.ndarray, feat_dim: int, method: str = "rand"
) -> jnp.ndarray:
    """Feature initialization when training a cloud from bare geometry
    (reference: neural_points.py:284-304). Methods: rand (U-0.5),
    zeros, ones, pos (positional encoding of xyz, rand-padded), or
    gau_<std> (gaussian)."""
    n = xyz.shape[0]
    if method == "rand":
        return jax.random.uniform(key, (n, feat_dim)) - 0.5
    if method == "zeros":
        return jnp.zeros((n, feat_dim))
    if method == "ones":
        return jnp.ones((n, feat_dim))
    if method == "pos":
        from pointnerf2studio_tpu.ops.encoding import positional_encoding
        if feat_dim <= 3:
            return xyz[:, :feat_dim]
        emb = positional_encoding(xyz, feat_dim // 6)
        if emb.shape[-1] < feat_dim:
            pad = jax.random.uniform(
                key, (n, feat_dim - emb.shape[-1])) - 0.5
            emb = jnp.concatenate([emb, pad], -1)
        return emb
    if method.startswith("gau"):
        std = float(method.split("_")[1])
        return std * jax.random.normal(key, (n, feat_dim))
    raise ValueError(f"unknown feature_init_method: {method}")


def jitter_points(
    key, xyz: jnp.ndarray, alive: jnp.ndarray, std: float,
    mode: str = "pointgaussian",
) -> jnp.ndarray:
    """Per-step position noise on live points (reference
    `pointgaussian`/`pointuniform`, neural_points.py:670-680)."""
    if mode == "pointgaussian":
        noise = std * jax.random.normal(key, xyz.shape, xyz.dtype)
    elif mode == "pointuniform":
        noise = (jax.random.uniform(key, xyz.shape, xyz.dtype) - 0.5) * std * 2
    else:
        raise ValueError(f"unknown point noise mode: {mode}")
    return jnp.where(alive[:, None], xyz + noise, xyz)

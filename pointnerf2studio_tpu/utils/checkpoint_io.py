"""Checkpoint interchange with the reference's torch format + orbax native.

The reference persists `<iter>_net_ray_marching.pth` state dicts
(reference: pointnerf/models/base_model.py:85-120; key names visible in
pointnerf/out.txt:33) containing:
  * aggregator MLP weights:  aggregator.block1/block3/alpha_branch/
    color_branch.<i>.{weight,bias}  (torch Linear: weight is [out, in])
  * neural point tensors:    neural_points.{xyz, points_embeding,
    points_conf, points_dir, points_color, Rw2c} with a leading batch
    dim of 1 on the points_* tensors.

This module loads those into our functional param tree (transposing
Linear weights to [in, out]) and can export back, so reference tooling
can read our checkpoints. Torch is used only as a (de)serializer here —
never for compute.

Native checkpoints (full TrainState incl. optimizer state) use orbax.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.aggregator import AggregatorParams
from pointnerf2studio_tpu.models.neural_points import (
    NeuralPointCloud, from_arrays)

# torch-key prefix -> (our tower name, is_head)
_LEGACY_TOWERS = {
    "aggregator.block1": "mlp_base",
    "aggregator.block3": "mlp_head",
    "aggregator.color_branch": None,   # split: layers 0..n-2 -> mlp_color,
                                       # last layer -> color_head
    "aggregator.alpha_branch": "density_head",
}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a .pth file into plain numpy arrays."""
    import torch  # serializer only

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _collect_tower(sd: Dict[str, np.ndarray], prefix: str):
    """Gather sequential Linear layers `prefix.<i>.{weight,bias}` in order."""
    idxs = sorted({int(k.split(".")[-2]) for k in sd
                   if k.startswith(prefix + ".") and k.endswith(".weight")})
    layers = []
    for i in idxs:
        w = sd[f"{prefix}.{i}.weight"]          # [out, in] torch layout
        b = sd[f"{prefix}.{i}.bias"]
        layers.append({"kernel": jnp.asarray(w.T.copy()),
                       "bias": jnp.asarray(b)})
    return layers


def import_aggregator_params(sd: Dict[str, np.ndarray]) -> AggregatorParams:
    """Map reference `aggregator.*` keys into our param tree."""
    params: AggregatorParams = {}
    params["mlp_base"] = _collect_tower(sd, "aggregator.block1")
    params["mlp_head"] = _collect_tower(sd, "aggregator.block3")
    params["density_head"] = _collect_tower(sd, "aggregator.alpha_branch")
    color = _collect_tower(sd, "aggregator.color_branch")
    if not (params["mlp_base"] and params["mlp_head"]
            and params["density_head"] and color):
        raise ValueError("missing aggregator.* towers in state dict")
    params["mlp_color"] = color[:-1]
    params["color_head"] = color[-1:]
    return params


def import_neural_points(
    sd: Dict[str, np.ndarray], capacity: Optional[int] = None
) -> NeuralPointCloud:
    """Map reference `neural_points.*` tensors (leading batch dim of 1)."""
    def get(name):
        a = sd[f"neural_points.{name}"]
        return a[0] if a.ndim == 3 and a.shape[0] == 1 else a

    xyz = sd["neural_points.xyz"]
    if xyz.ndim == 3:
        xyz = xyz[0]
    rw2c = sd.get("neural_points.Rw2c", np.eye(3, dtype=np.float32))
    # Convention boundary: the reference right-multiplies row vectors
    # by Rw2c^T (it transposes the stored tensor at use,
    # point_aggregators.py:509, studio_model.py:302); this repo
    # right-multiplies by Rw2c directly, so the stored tensor
    # transposes at import (and back at export). Identity for every
    # shipped checkpoint; load-bearing for edited scenes
    # (tests/test_reference_oracle.py pins the executed-reference
    # behavior).
    rw2c = np.swapaxes(np.asarray(rw2c), -1, -2)
    return from_arrays(
        xyz=xyz,
        points_embeding=get("points_embeding"),
        points_conf=get("points_conf"),
        points_dir=get("points_dir"),
        points_color=get("points_color"),
        Rw2c=rw2c,
        capacity=capacity,
    )


def export_torch_checkpoint(
    params: AggregatorParams,
    points: Optional[NeuralPointCloud],
    path: str,
) -> None:
    """Write a reference-compatible `*_net_ray_marching.pth`.

    Only live points are exported (the reference has no dead-slot
    concept). Keys/layout match base_model.save_networks output so
    run/test_ft.py, run/editing.py and the studio loader can read it.
    """
    import torch

    sd: Dict[str, Any] = {}

    def put_tower(prefix, layers):
        for i, lyr in enumerate(layers):
            sd[f"{prefix}.{2 * i}.weight"] = torch.from_numpy(
                np.asarray(lyr["kernel"]).T.copy())
            sd[f"{prefix}.{2 * i}.bias"] = torch.from_numpy(
                np.asarray(lyr["bias"]).copy())

    put_tower("aggregator.block1", params["mlp_base"])
    put_tower("aggregator.block3", params["mlp_head"])
    put_tower("aggregator.alpha_branch", params["density_head"])
    put_tower("aggregator.color_branch",
              list(params["mlp_color"]) + list(params["color_head"]))

    if points is not None:
        alive = np.asarray(points.alive)

        def live(a):
            return torch.from_numpy(np.asarray(a)[alive][None].copy())

        sd["neural_points.xyz"] = live(points.xyz)[0]
        sd["neural_points.points_embeding"] = live(points.points_embeding)
        sd["neural_points.points_conf"] = live(points.points_conf)
        sd["neural_points.points_dir"] = live(points.points_dir)
        sd["neural_points.points_color"] = live(points.points_color)
        rw2c = np.asarray(points.Rw2c)
        if rw2c.ndim == 3:          # per-point (edited): live rows only
            rw2c = rw2c[alive]
        sd["neural_points.Rw2c"] = torch.from_numpy(
            np.swapaxes(rw2c, -1, -2).copy())

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(sd, path)


def load_reference_checkpoint(
    path: str, capacity: Optional[int] = None
) -> Tuple[AggregatorParams, Optional[NeuralPointCloud]]:
    """One-call import of a reference `*_net_ray_marching.pth`."""
    sd = load_torch_state_dict(path)
    params = import_aggregator_params(sd)
    points = None
    if "neural_points.xyz" in sd:
        points = import_neural_points(sd, capacity=capacity)
    return params, points


# ---- native (orbax) checkpoints ----

def save_train_state(ckpt_dir: str, state, step: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    if os.path.isdir(path):
        # idempotent re-save (orbax refuses existing destinations):
        # a crashed-then-restarted run may hit the same save step
        import shutil
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def restore_train_state(ckpt_dir: str, step: int, template):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None


def export_states_file(path: str, epoch_count: int, total_steps: int,
                       best_PSNR: float = 0.0,
                       best_iter: int = 0) -> None:
    """Write the reference's `<iter>_states.pth` sidecar (epoch_count /
    total_steps / best_PSNR — base_model.save_networks, reference
    base_model.py:85-102) so reference resume tooling can read our
    training runs."""
    import torch

    torch.save({"epoch_count": epoch_count, "total_steps": total_steps,
                "best_PSNR": best_PSNR, "best_iter": best_iter}, path)


def load_states_file(path: str) -> Dict[str, Any]:
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    return {k: (v.item() if hasattr(v, "item") else v)
            for k, v in d.items()}

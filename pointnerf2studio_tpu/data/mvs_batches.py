"""MVS view-batch construction from a posed image dataset.

Replaces the reference's `get_init_item` assembly
(reference: pointnerf/data/nerf_synth360_ft_dataset.py:476-552): for
each reference view, pick the nearest source views by camera position,
build full-res intrinsics/extrinsics, and carry near/far ranges. The
reference reads precomputed pair lists (data/nerf_synth_configs/list);
we select pairs by pose proximity, which reproduces their structure.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from pointnerf2studio_tpu.data.blender import BlenderDataset
from pointnerf2studio_tpu.models.mvsnet.pointgen import MVSViewBatch


def camera_triangles(cam_xyz: np.ndarray) -> np.ndarray:
    """Triangulate the camera rig -> view triples [T, 3] int.

    The reference runs open3d ball-pivoting over the camera POSITIONS
    and uses each mesh triangle as one MVS (ref, src, src) triple
    (reference: nerf_synth360_ft_dataset.py:338-349 ->
    data_utils.triangluation_bpa:81-120). For cameras on a sphere —
    every supported capture rig — the convex hull of the positions is
    the same surface triangulation, and scipy provides it without the
    open3d dependency.
    """
    from scipy.spatial import ConvexHull

    c = np.asarray(cam_xyz, np.float64)
    hull = ConvexHull(c - c.mean(0, keepdims=True))
    return np.asarray(hull.simplices, np.int32)


def build_view_batches(
    dataset: BlenderDataset,
    num_src: int = 2,
    max_batches: Optional[int] = None,
    near_far_depth: Optional[Tuple[float, float]] = None,
    pairing: str = "nearest",
) -> Tuple[List[MVSViewBatch], np.ndarray, np.ndarray, np.ndarray]:
    """-> (view batches, alpha maps, intrinsics [V,3,3], w2cs [V,4,4]).

    `pairing`: "nearest" picks the closest cameras per reference view;
    "triangles" reproduces the reference's BPA camera-rig
    triangulation (one batch per triangle; requires num_src == 2).

    Alpha maps here are binary foreground masks derived from non-white
    pixels (the blender loader composites onto white; the reference
    stores the PNG alpha directly — equivalent for synthetic data).
    """
    V = dataset.num_views
    campos = dataset.poses[:, :3, 3]
    w2cs = np.stack([np.linalg.inv(p) for p in dataset.poses])
    K = np.tile(dataset.intrinsics[None], (V, 1, 1))
    nf_depth = near_far_depth or (dataset.near, dataset.far)

    alphas = (np.any(dataset.images < 0.999, axis=-1)).astype(np.float32)

    if pairing == "triangles":
        if num_src != 2:
            raise ValueError("triangle pairing implies num_src == 2")
        triples = [list(t) for t in camera_triangles(campos)]
    elif pairing == "nearest":
        triples = []
        for r in range(V):
            d = np.linalg.norm(campos - campos[r], axis=-1)
            order = np.argsort(d)
            src = [v for v in order if v != r][:num_src]
            triples.append([r] + src)
    else:
        raise ValueError(f"unknown pairing {pairing!r}")

    batches: List[MVSViewBatch] = []
    for ids in triples[: (max_batches or len(triples))]:
        batches.append(MVSViewBatch(
            images=dataset.images[ids],
            intrinsics=K[ids],
            w2cs=w2cs[ids],
            c2ws=dataset.poses[ids],
            near_far_depth=nf_depth,
            near_far=(dataset.near, dataset.far),
        ))
    return batches, alphas, K, w2cs

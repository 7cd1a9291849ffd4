"""Point-cloud initialization from external reconstructions (PLY).

The reference's colmap scene family (pointnerf/dev_scripts/
w_colmap_n360/*.sh) initializes the neural point cloud from a COLMAP
dense reconstruction instead of MVSNet:
`load_init_points` reads `colmap_results/dense/fused.ply`
(reference: pointnerf/data/nerf_synth360_ft_dataset.py:358-375) and
features are initialized by `feature_init_method`
(neural_points.py:284-304). This module provides the same path:
a dependency-free PLY reader (ascii + binary_little_endian) and a
cloud builder that voxel-downsamples, initializes features, and
returns a render-ready NeuralPointCloud.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PLY_DTYPES = {
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
}


def load_ply(path: str) -> Dict[str, np.ndarray]:
    """Read a PLY point cloud -> {"xyz": [N,3] f32, "color": [N,3] f32
    in [0,1] or None}. Supports ascii and binary_little_endian vertex
    elements (the formats COLMAP/Open3D emit)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_vertex = 0
        props = []          # (name, numpy dtype) for the vertex element
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated PLY header")
            tok = line.decode("ascii", "replace").strip().split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                in_vertex = tok[1] == "vertex"
                if in_vertex:
                    n_vertex = int(tok[2])
            elif tok[0] == "property" and in_vertex:
                if tok[1] == "list":
                    raise ValueError("list property in vertex element")
                props.append((tok[2], _PLY_DTYPES[tok[1]]))
            elif tok[0] == "end_header":
                break

        names = [p[0] for p in props]
        if fmt == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n_vertex,
                              ndmin=2)
            rec = {n: rows[:, i] for i, (n, _) in enumerate(props)}
        elif fmt == "binary_little_endian":
            dt = np.dtype([(n, "<" + d) for n, d in props])
            raw = np.frombuffer(f.read(dt.itemsize * n_vertex), dtype=dt,
                                count=n_vertex)
            rec = {n: raw[n] for n in names}
        else:
            raise ValueError(f"unsupported PLY format: {fmt}")

    xyz = np.stack([rec["x"], rec["y"], rec["z"]], -1).astype(np.float32)
    color = None
    if all(c in rec for c in ("red", "green", "blue")):
        color = np.stack([rec["red"], rec["green"], rec["blue"]],
                         -1).astype(np.float32)
        if color.max() > 1.001:
            color = color / 255.0
    return {"xyz": xyz, "color": color}


def init_cloud_from_points(
    xyz: np.ndarray,                 # [N, 3]
    color: Optional[np.ndarray],     # [N, 3] in [0, 1] or None
    feat_dim: int = 32,
    feature_init_method: str = "rand",
    default_conf: float = 0.3,
    vox_res: int = 0,
    ranges: Optional[Tuple[float, ...]] = None,
    capacity: Optional[int] = None,
    seed: int = 0,
    point_noise: str = "",
):
    """Build a trainable NeuralPointCloud from bare geometry
    (reference: train_ft.py:645-680 load_init_points path +
    NeuralPoints feature init :284-304).

    `point_noise` ("pointgaussian_0.1" | "pointuniform_0.1") jitters
    the loaded positions once at init, exactly where the reference
    applies --point_noise to a freshly loaded cloud
    (neural_points.py:243-248 calling :670-680)."""
    from pointnerf2studio_tpu.models import neural_points as npts
    from pointnerf2studio_tpu.models.mvsnet.pointgen import (
        voxel_downsample_closest)

    xyz = np.asarray(xyz, np.float32)
    if point_noise:
        mode, std_s = point_noise.split("_")
        std = float(std_s)
        if std > 0.0:
            # N-changing variants first (host-side; reference
            # neural_points.py:681-688): "add" keeps the originals and
            # appends a jittered copy, "double" jitters a doubled set
            doubled = mode in ("pointuniformadd", "pointuniformdouble")
            keep_originals = mode == "pointuniformadd"
            if doubled:
                mode = "pointuniform"
                if color is not None:
                    color = np.concatenate([color, color], 0)
            base = xyz
            if doubled and not keep_originals:
                xyz = np.concatenate([xyz, xyz], 0)
            xyz = np.asarray(npts.jitter_points(
                jax.random.PRNGKey(seed + 1), jnp.asarray(xyz),
                jnp.ones((xyz.shape[0],), bool), std, mode=mode),
                np.float32)
            if keep_originals:
                xyz = np.concatenate([base, xyz], 0)
    if ranges is not None:
        r = np.asarray(ranges, np.float32)
        keep = np.all((xyz >= r[:3]) & (xyz <= r[3:]), axis=-1)
        xyz = xyz[keep]
        color = color[keep] if color is not None else None
    if vox_res > 0:
        _, keep_idx = voxel_downsample_closest(xyz, vox_res)
        xyz = xyz[keep_idx]
        color = color[keep_idx] if color is not None else None

    n = xyz.shape[0]
    key = jax.random.PRNGKey(seed)
    emb = np.asarray(npts.init_features(
        key, jnp.asarray(xyz), feat_dim, feature_init_method), np.float32)
    conf = np.full((n, 1), default_conf, np.float32)
    dirs = xyz / np.maximum(np.linalg.norm(xyz, axis=-1, keepdims=True),
                            1e-6)
    if color is None:
        color = np.full((n, 3), 0.5, np.float32)
    return npts.from_arrays(xyz, emb, conf, dirs, color,
                            capacity=capacity)


def init_points_from_depth(
    depths: np.ndarray,       # [V, H, W] metric depth (0 = invalid)
    poses: np.ndarray,        # [V, 4, 4] c2w, OpenCV convention
    intrinsics: np.ndarray,   # [3, 3]
    images: Optional[np.ndarray] = None,    # [V, H, W, 3] for colors
    stride: int = 1,          # pixel subsampling
    max_depth: float = 10.0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Unproject sensor depth maps into a world point cloud — the
    ScanNet init path (reference: train_ft.py:652-654
    `load_init_depth_points`, dataset class upstream-only).

    Returns (xyz [N, 3], color [N, 3] or None); feed into
    `init_cloud_from_points` for downsampling + feature init.
    """
    V, H, W = depths.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    us, vs = np.meshgrid(np.arange(0, W, stride), np.arange(0, H, stride))
    xyz_all, col_all = [], []
    for v in range(V):
        d = depths[v, ::stride, ::stride]
        ok = (d > 0) & (d < max_depth) & np.isfinite(d)
        if not ok.any():
            continue
        z = d[ok]
        x = (us[ok] + 0.5 - cx) / fx * z
        y = (vs[ok] + 0.5 - cy) / fy * z
        cam = np.stack([x, y, z, np.ones_like(z)], -1)
        world = cam @ poses[v].T
        xyz_all.append(world[:, :3].astype(np.float32))
        if images is not None:
            col_all.append(images[v, ::stride, ::stride][ok])
    xyz = np.concatenate(xyz_all, 0)
    color = np.concatenate(col_all, 0).astype(np.float32) \
        if images is not None else None
    return xyz, color

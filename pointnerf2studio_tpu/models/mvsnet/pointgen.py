"""Neural point cloud generation from multi-view images.

TPU-native re-build of the reference's point-initialization pipeline
(reference: pointnerf/run/train_ft.py:51-167 `gen_points_filter_embeddings`,
pointnerf/models/mvs/mvs_points_model.py:261-382,
pointnerf/models/mvs/filter_utils.py:157-292, and
pointnerf/models/mvs/mvs_utils.py:537-562,573-606):

  1. per view-triple: pretrained MVSNet depth + photometric confidence
     at 1/4 res, nearest-upsampled to full res,
  2. unproject to camera-space points (NDC -> cam, optional gaussian
     depth jitter with `std_depth`),
  3. cross-view geometric consistency filtering (reproject ref depth
     into src views; accept if pixel error < 1 px and relative depth
     error < 1%; require >= geo_cnsst_num consistent views; average the
     consistent depths),
  4. visual-hull filtering against every training view's alpha mask,
  5. voxel downsampling at `vox_res` (points become voxel centroids;
     attributes come from the original point nearest each centroid),
  6. per-point appearance embedding: FPN features + color + view dir +
     confidence through the premlp (query_embedding semantics with
     imgfeat_0_0123 / dir_0 / point_conf).

Host-orchestrated over views; the per-view math is jitted JAX.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.mvsnet.featurenet import (
    FPNParams, fpn_features, premlp_embed)
from pointnerf2studio_tpu.models.mvsnet.layers import bilinear_grid_sample
from pointnerf2studio_tpu.models.mvsnet.mvsnet import (
    MVSNetParams, mvsnet_depth)


@dataclasses.dataclass
class PointGenConfig:
    num_depth_bins: int = 192
    depth_conf_thresh: float = 0.8
    geo_cnsst_num: int = 2
    vox_res: int = 320
    std_depth: float = 0.0
    alpha_thresh: float = 0.1
    ranges: Optional[Tuple[float, ...]] = None   # (x0,y0,z0,x1,y1,z1)
    default_conf: float = 0.15
    # Background sheet for unbounded / ScanNet-style scenes
    # (filter_utils.py:275-283): every pixel REJECTED by the fused
    # filter contributes a point at its camera xy pushed to depth
    # far + far_plane_shift, confidence 0.02 — a far plane that
    # catches rays which would otherwise miss all points. None = off
    # (NeRF-Synthetic); ScanNet presets use e.g. 8.0.
    far_plane_shift: Optional[float] = None
    # Depth source per reference manual_depth_view
    # (mvs_points_model.py:282-340):
    #   "mvsnet" — pretrained-MVSNet inference depth + photometric
    #              confidence (manual_depth_view == 1; every shipped
    #              dev_script uses this)
    #   "gt"     — dataset ground-truth depth for the reference view
    #              (manual_depth_view == 0: cam_expected_depth =
    #              depths_h, confidence = 1, gaussian jitter of
    #              std_depth); requires MVSViewBatch.gt_depth
    depth_mode: str = "mvsnet"


@dataclasses.dataclass
class MVSViewBatch:
    """One reference view + its source views (full resolution)."""
    images: np.ndarray        # [V, H, W, 3], ref first
    intrinsics: np.ndarray    # [V, 3, 3] full-res
    w2cs: np.ndarray          # [V, 4, 4]
    c2ws: np.ndarray          # [V, 4, 4]
    near_far_depth: Tuple[float, float]   # depth-bin range (MVS)
    near_far: Tuple[float, float]         # scene range
    # ground-truth reference-view depth [H, W] (depth_mode="gt";
    # reference depths_h, mvs_points_model.py:267,292)
    gt_depth: Optional[np.ndarray] = None


def quarter_intrinsics(K: np.ndarray) -> np.ndarray:
    Kq = K.copy()
    Kq[..., :2, :] = Kq[..., :2, :] / 4.0
    return Kq


def rel_proj_mats(intrinsics_q: np.ndarray, w2cs: np.ndarray) -> np.ndarray:
    """[V, 4, 4] src @ inv(ref) projection mats at 1/4 res."""
    V = w2cs.shape[0]
    proj = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    proj[:, :3, :4] = intrinsics_q @ w2cs[:, :3, :4]
    ref_inv = np.linalg.inv(proj[0])
    return (proj @ ref_inv).astype(np.float32)


def depth_to_cam_points(depth: jnp.ndarray, conf: jnp.ndarray,
                        intrinsic: jnp.ndarray,
                        near_far: Tuple[float, float],
                        std_depth: float = 0.0,
                        key: Optional[jax.Array] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-res depth map -> camera-space points + validity mask.

    NDC clamp + unprojection per mvs_points_model.py:150-181 and
    mvs_utils.ndc_2_cam:92-99.
    """
    H, W = depth.shape
    near, far = near_far
    mask = (depth >= near) & (depth <= far)
    ndc_z = (depth - near) / (far - near)
    if std_depth > 0.0 and key is not None:
        ndc_z = ndc_z + std_depth * jax.random.normal(key, ndc_z.shape)
    ndc_z = jnp.clip(ndc_z, 0.0, 1.0)
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) / (H - 1),
                        jnp.arange(W, dtype=jnp.float32) / (W - 1),
                        indexing="ij")
    cam_z = ndc_z * (far - near) + near
    cam_xy = jnp.stack([x * (W - 1), y * (H - 1)], -1) * cam_z[..., None]
    cam_xyz = jnp.concatenate([cam_xy, cam_z[..., None]], -1)
    Kinv_t = jnp.linalg.inv(intrinsic).T
    cam_xyz = cam_xyz @ Kinv_t
    return cam_xyz, mask & (conf > 0)


def _sample_depth_border(depth_src: jnp.ndarray, x: jnp.ndarray,
                         y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with border padding, align_corners=True
    (filter_utils.py:183)."""
    H, W = depth_src.shape
    fx = jnp.clip(x, 0.0, W - 1.0)
    fy = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = fx - x0
    wy = fy - y0
    v = (depth_src[y0, x0] * (1 - wx) * (1 - wy)
         + depth_src[y0, x1] * wx * (1 - wy)
         + depth_src[y1, x0] * (1 - wx) * wy
         + depth_src[y1, x1] * wx * wy)
    return v


def geometric_consistency(
    depth_ref: jnp.ndarray, K_ref: jnp.ndarray, E_ref: jnp.ndarray,
    depth_src: jnp.ndarray, K_src: jnp.ndarray, E_src: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(geo_mask, reprojected depth zeroed outside mask) for one src view.

    filter_utils.check_geometric_consistency_gpu:203-220.
    """
    H, W = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(x)
    pix = jnp.stack([x.ravel(), y.ravel(), ones.ravel()], 0)       # [3, HW]
    xyz_ref = jnp.linalg.inv(K_ref) @ (pix * depth_ref.ravel())
    T = E_src @ jnp.linalg.inv(E_ref)
    xyz_src = (T[:3, :3] @ xyz_ref + T[:3, 3:4])
    Kx = K_src @ xyz_src
    xy_src = Kx[:2] / Kx[2:3]
    xs = xy_src[0].reshape(H, W)
    ys = xy_src[1].reshape(H, W)
    d_src = _sample_depth_border(depth_src, xs, ys)
    xyz_src2 = jnp.linalg.inv(K_src) @ (
        jnp.concatenate([xy_src, ones.reshape(1, -1)], 0) * d_src.ravel())
    Tb = E_ref @ jnp.linalg.inv(E_src)
    xyz_re = Tb[:3, :3] @ xyz_src2 + Tb[:3, 3:4]
    depth_re = xyz_re[2].reshape(H, W)
    Kr = K_ref @ xyz_re
    xr = (Kr[0] / Kr[2]).reshape(H, W)
    yr = (Kr[1] / Kr[2]).reshape(H, W)
    dist = jnp.sqrt((xr - x) ** 2 + (yr - y) ** 2)
    rel = jnp.abs(depth_re - depth_ref) / jnp.maximum(depth_ref, 1e-8)
    mask = (dist < 1.0) & (rel < 0.01)
    return mask, jnp.where(mask, depth_re, 0.0)


def filter_view(
    cam_xyz: jnp.ndarray,          # [H, W, 3] this ref view's points
    conf: jnp.ndarray,             # [H, W]
    points_mask: jnp.ndarray,      # [H, W]
    view_idx: int,
    all_depths: Sequence[jnp.ndarray],
    all_K: Sequence[jnp.ndarray],
    all_E: Sequence[jnp.ndarray],
    cfg: PointGenConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-view fused mask + averaged depth (filter_by_masks_gpu)."""
    depth_ref = cam_xyz[..., 2]
    geo_sum = jnp.zeros_like(depth_ref, dtype=jnp.int32)
    depth_sum = jnp.zeros_like(depth_ref)
    for j in range(len(all_depths)):
        if j == view_idx:
            continue
        m, d = geometric_consistency(depth_ref, all_K[view_idx],
                                     all_E[view_idx], all_depths[j],
                                     all_K[j], all_E[j])
        geo_sum = geo_sum + m.astype(jnp.int32)
        depth_sum = depth_sum + d
    depth_avg = (depth_sum + depth_ref) / (geo_sum + 1)
    final = (conf > cfg.depth_conf_thresh) & points_mask
    if len(all_depths) > 1:
        final = final & (geo_sum >= cfg.geo_cnsst_num)
    xyz = jnp.concatenate([cam_xyz[..., :2], depth_avg[..., None]], -1)
    return xyz, final, conf


def alpha_masking(points_w: jnp.ndarray, alphas: np.ndarray,
                  intrinsics: np.ndarray, w2cs: np.ndarray,
                  near_far: Optional[Tuple[float, float]],
                  thresh: float = 0.1) -> jnp.ndarray:
    """Visual-hull mask: keep points projecting into alpha>thresh (or
    out of frame) in EVERY view (mvs_utils.alpha_masking:573-606)."""
    N = points_w.shape[0]
    keep = jnp.ones((N,), bool)
    p1 = jnp.concatenate([points_w, jnp.ones((N, 1), points_w.dtype)], -1)
    for i in range(alphas.shape[0]):
        alpha = jnp.asarray(alphas[i])
        H, W = alpha.shape
        cam = p1 @ jnp.asarray(w2cs[i]).T
        pix = cam[:, :3] @ jnp.asarray(intrinsics[i]).T
        xy = jnp.floor(pix[:, :2] / pix[:, 2:3]).astype(jnp.int32)
        inb = jnp.all((xy >= 0) & (xy < jnp.array([W, H])), -1)
        xc = jnp.clip(xy[:, 0], 0, W - 1)
        yc = jnp.clip(xy[:, 1], 0, H - 1)
        m = (alpha[yc, xc] + (~inb).astype(alpha.dtype)) > thresh
        if near_far is not None:
            m = m & (cam[:, 2] >= near_far[0] - 1.0) & (cam[:, 2] <= near_far[1])
        keep = keep & m
    return keep


def voxel_downsample_closest(xyz: np.ndarray, vox_res: int
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """(centroids, index of the original point nearest each centroid).

    construct_vox_points_closest (mvs_utils.py:537-562) via numpy
    sort/segment ops instead of torch_scatter.
    """
    xyz = np.asarray(xyz, np.float32)
    xyz_min, xyz_max = xyz.min(0), xyz.max(0)
    edge = (xyz_max - xyz_min).max() * 1.05
    mid = (xyz_max + xyz_min) / 2
    smin = mid - edge / 2
    vsz = edge / vox_res
    g = np.floor((xyz - smin) / vsz).astype(np.int64)
    flat = (g[:, 0] * (vox_res + 2) + g[:, 1]) * (vox_res + 2) + g[:, 2]
    uniq, inv = np.unique(flat, return_inverse=True)
    nvox = uniq.shape[0]
    cnt = np.bincount(inv, minlength=nvox).astype(np.float64)
    cent = np.stack([
        np.bincount(inv, weights=xyz[:, c], minlength=nvox) for c in range(3)
    ], -1) / cnt[:, None]
    res = np.linalg.norm(xyz - cent[inv], axis=-1)
    order = np.lexsort((res, inv))
    first = np.concatenate([[True], inv[order][1:] != inv[order][:-1]])
    min_idx = order[first]
    return cent.astype(np.float32), min_idx


def embed_points(
    fpn: FPNParams,
    cam_xyz: jnp.ndarray,          # [N, 3] points in this view's ref cam
    conf: jnp.ndarray,             # [N]
    images: jnp.ndarray,           # [V, H, W, 3]
    c2w_ref: jnp.ndarray,          # [4, 4] of the ref view
    intrinsic: jnp.ndarray,        # [3, 3] full res
) -> Dict[str, jnp.ndarray]:
    """Per-point embedding/color/dir/conf (query_embedding with
    imgfeat_0_0123 dir_0 point_conf, pointdir_w=True —
    mvs_points_model.py:224-258, extract_2d:199-220)."""
    H, W = images.shape[1:3]
    feats = fpn_features(fpn, images[0])

    pix = (cam_xyz / cam_xyz[:, 2:3]) @ intrinsic.T
    xy = pix[:, :2]
    inb = jnp.all((xy >= 0) & (xy <= jnp.array([W - 1, H - 1],
                                               xy.dtype)), -1)
    gx = xy[:, 0] / ((W - 1) / 2.0) - 1.0
    gy = xy[:, 1] / ((H - 1) / 2.0) - 1.0
    grid = jnp.stack([gx, gy], -1)

    sampled = [bilinear_grid_sample(f, grid, align_corners=True)
               * inb[:, None] for f in feats]
    colors = sampled[0]
    emb_feats = jnp.concatenate(sampled[1:], -1)            # [N, 56]

    campos_cam = jnp.zeros((3,))                            # ref cam origin
    dirs = cam_xyz - campos_cam
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)
    dirs_w = dirs @ c2w_ref[:3, :3].T                       # pointdir_w=True

    conf = conf[:, None]
    embedding = premlp_embed(fpn, emb_feats, colors, dirs_w, conf)
    return {"embedding": embedding, "color": colors, "dir": dirs_w,
            "conf": conf}


def generate_point_cloud(
    mvs_params: MVSNetParams,
    fpn_params: FPNParams,
    view_batches: List[MVSViewBatch],
    alphas: Optional[np.ndarray] = None,       # [Vall, H, W]
    alpha_intrinsics: Optional[np.ndarray] = None,
    alpha_w2cs: Optional[np.ndarray] = None,
    cfg: PointGenConfig = PointGenConfig(),
) -> Dict[str, np.ndarray]:
    """Full pipeline -> dict of xyz/embedding/color/dir/conf arrays."""
    depth_fn = jax.jit(mvsnet_depth)

    cam_xyz_l, conf_l, mask_l, K_l, E_l = [], [], [], [], []
    for vb in view_batches:
        if cfg.depth_mode == "gt":
            # manual_depth_view == 0: dataset GT depth as the expected
            # depth, confidence 1 (mvs_points_model.py:290-293 — the
            # reference leaves photometric confidence empty here)
            if vb.gt_depth is None:
                raise ValueError(
                    "depth_mode='gt' needs MVSViewBatch.gt_depth")
            depth = np.asarray(vb.gt_depth, np.float32)
            conf = np.ones_like(depth)
        else:
            Kq = quarter_intrinsics(vb.intrinsics)
            proj = rel_proj_mats(Kq, vb.w2cs)
            dmin, dmax = vb.near_far_depth
            dvals = (dmin + np.arange(cfg.num_depth_bins,
                                      dtype=np.float32)
                     * ((dmax - dmin) / cfg.num_depth_bins))
            imgs_q = jnp.asarray(_downsample4(vb.images))
            depth_q, conf_q, _ = depth_fn(
                mvs_params, imgs_q, jnp.asarray(proj),
                jnp.asarray(dvals))
            depth = _upsample_nearest(np.asarray(depth_q),
                                      vb.images.shape[1:3])
            conf = _upsample_nearest(np.asarray(conf_q),
                                     vb.images.shape[1:3])
        cam_xyz, mask = depth_to_cam_points(
            jnp.asarray(depth), jnp.asarray(conf),
            jnp.asarray(vb.intrinsics[0]), vb.near_far, cfg.std_depth)
        cam_xyz_l.append(cam_xyz)
        conf_l.append(jnp.asarray(conf))
        mask_l.append(mask)
        K_l.append(jnp.asarray(vb.intrinsics[0]))
        E_l.append(jnp.asarray(vb.w2cs[0]))

    depths = [c[..., 2] for c in cam_xyz_l]
    world_l, conf_f_l, vid_l = [], [], []
    for i in range(len(view_batches)):
        xyz, final, conf = filter_view(cam_xyz_l[i], conf_l[i], mask_l[i],
                                       i, depths, K_l, E_l, cfg)
        final_np = np.asarray(final).reshape(-1)
        xyz_cam = np.asarray(xyz).reshape(-1, 3)[final_np]
        c = np.asarray(conf).reshape(-1)[final_np]
        if cfg.far_plane_shift is not None:
            # background sheet (filter_utils.py:275-283): rejected
            # pixels keep their camera xy, depth moves to
            # far + far_plane_shift, confidence 0.02
            bg_xy = np.asarray(xyz).reshape(-1, 3)[~final_np, :2]
            bg_z = np.full(
                (bg_xy.shape[0], 1),
                view_batches[i].near_far[1] + cfg.far_plane_shift,
                np.float32)
            xyz_cam = np.concatenate(
                [xyz_cam, np.concatenate([bg_xy, bg_z], -1)], 0)
            c = np.concatenate(
                [c, np.full(bg_xy.shape[0], 0.02, np.float32)], 0)
        c2w = np.linalg.inv(np.asarray(E_l[i]))
        world = np.concatenate(
            [xyz_cam, np.ones_like(xyz_cam[:, :1])], -1) @ c2w.T
        world = world[:, :3]
        if cfg.ranges is not None and cfg.ranges[0] > -90.0:
            r = np.asarray(cfg.ranges, np.float32)
            keep = np.all((world >= r[:3]) & (world <= r[3:]), -1)
            world, c = world[keep], c[keep]
        world_l.append(world)
        conf_f_l.append(c)
        vid_l.append(np.full(world.shape[0], i, np.int32))

    world = np.concatenate(world_l, 0)
    confs = np.concatenate(conf_f_l, 0)
    vids = np.concatenate(vid_l, 0)

    if alphas is not None:
        nf = view_batches[0].near_far if (cfg.ranges is None
                                          or cfg.ranges[0] < -90.0) else None
        keep = np.asarray(alpha_masking(
            jnp.asarray(world), alphas, alpha_intrinsics, alpha_w2cs, nf,
            cfg.alpha_thresh))
        world, confs, vids = world[keep], confs[keep], vids[keep]

    if cfg.vox_res > 0 and world.shape[0] > 0:
        cent, min_idx = voxel_downsample_closest(world, cfg.vox_res)
        world = cent
        confs = confs[min_idx]
        vids = vids[min_idx]

    # per-view embedding of the surviving points
    out = {k: [] for k in ("xyz", "embedding", "color", "dir", "conf")}
    for i, vb in enumerate(view_batches):
        sel = vids == i
        if not sel.any():
            continue
        pts_w = world[sel]
        E = np.asarray(E_l[i])
        cam = np.concatenate([pts_w, np.ones_like(pts_w[:, :1])], -1) @ E.T
        res = embed_points(
            fpn_params, jnp.asarray(cam[:, :3].astype(np.float32)),
            jnp.asarray(confs[sel].astype(np.float32)),
            jnp.asarray(vb.images), jnp.asarray(np.linalg.inv(E)),
            jnp.asarray(vb.intrinsics[0]))
        out["xyz"].append(pts_w)
        out["embedding"].append(np.asarray(res["embedding"]))
        out["color"].append(np.asarray(res["color"]))
        out["dir"].append(np.asarray(res["dir"]))
        out["conf"].append(np.asarray(res["conf"]))

    return {k: np.concatenate(v, 0) if v else np.zeros((0, 3), np.float32)
            for k, v in out.items()}


def _downsample4(images: np.ndarray) -> np.ndarray:
    """Area-downsample x4 (the reference feeds 1/4-res images to MVSNet
    via its dataset's mvs image pyramid)."""
    V, H, W, C = images.shape
    return images.reshape(V, H // 4, 4, W // 4, 4, C).mean((2, 4)).astype(
        np.float32)


def _upsample_nearest(x: np.ndarray, hw) -> np.ndarray:
    H, W = hw
    h, w = x.shape
    return np.repeat(np.repeat(x, H // h, 0), W // w, 1)

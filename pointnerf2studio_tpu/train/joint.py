"""Joint MVS + Point-NeRF training (the reference's `opt.mode == 0`).

Feedforward mode: every step REGENERATES the neural point cloud from the
current MVS networks (learned depth probability, `manual_depth_view=-1`)
and renders through it, so gradients flow from the photometric loss back
through the point embeddings into FeatureNet / CostRegNet / ProbNet /
premlp (reference: pointnerf/models/mvs_points_volumetric_model.py:38-45
mode 0 creates both net_mvs and net_ray_marching;
mvs_points_model.py:261-340 gen_points with manual_depth_view == -1;
run scripts drive it with a third Adam group `--mvs_lr 5e-4`,
mvs_points_model.py:79).

TPU design: one jitted step with STATIC shapes — the generated cloud
has exactly H/4 * W/4 candidate points (one per ref-view feature pixel;
`num_each_depth=1`, the default gau_single_sampler), carrying a validity
mask from the prob_filter instead of dynamic boolean selection. The
voxel grid is rebuilt inside the step (the reference also rebuilds its
grid every forward, point_query.py:86-93).

Gradient paths (matching torch autograd through the reference code):
  loss -> rendered color -> point embedding/color/dir/conf -> premlp,
  FPN feature warps, ProbNet depth expectation (through point xyz ->
  inverse-distance weights AND sampled depth)
Non-differentiable (selection only): prob_filter mask, K-NN indices,
voxel-grid structure.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.models.aggregator import AggregatorParams
from pointnerf2studio_tpu.models.mvsnet.costvol import (
    CostVolParams, depth_probability, expected_depth_std, init_costvol_params,
    init_fpn_params, init_premlp_params)
from pointnerf2studio_tpu.models.mvsnet.featurenet import fpn_features
from pointnerf2studio_tpu.models.mvsnet.layers import bilinear_grid_sample
from pointnerf2studio_tpu.models.neural_points import NeuralPointCloud
from pointnerf2studio_tpu.models.render import render_rays
from pointnerf2studio_tpu.ops.grid import build_grid, compute_grid_geometry
from pointnerf2studio_tpu.train.loss import compute_losses


@struct.dataclass
class MvsParams:
    """Trainable MVS stack (the reference's net_mvs state)."""
    fpn: Any          # FeatureNet(intermediate=True)
    premlp: Any       # embedding MLP
    costvol: Any      # CostRegNet + ProbNet


@struct.dataclass
class JointState:
    mvs: MvsParams
    fields: AggregatorParams
    opt_state_mvs: Any
    opt_state_fields: Any
    step: jnp.ndarray


class MVSTrainBatch(NamedTuple):
    """Static-shape device batch for one joint step."""
    images: jnp.ndarray        # [V, H, W, 3] ref view first
    intrinsics: jnp.ndarray    # [V, 3, 3] full-res
    w2cs: jnp.ndarray          # [V, 4, 4]
    c2ws: jnp.ndarray          # [V, 4, 4]
    near_far: jnp.ndarray      # [2] scene depth range of the ref view
    # ray supervision (sampled from the ref or another train view)
    campos: jnp.ndarray        # [3]
    camrotc2w: jnp.ndarray     # [3, 3]
    raydirs: jnp.ndarray       # [R, 3]
    gt_rgb: jnp.ndarray        # [R, 3]


def init_joint_params(key, num_views: int = 3,
                      premlp_layers: int = 1) -> MvsParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return MvsParams(
        fpn=init_fpn_params(k1),
        premlp=init_premlp_params(k2, in_dim=63, num_layers=premlp_layers),
        costvol=init_costvol_params(k3, num_views=num_views),
    )


def load_pretrained_joint_params(key, best_net_mvs_path: str,
                                 num_views: int = 3) -> MvsParams:
    """Joint stack seeded from the shipped `best_net_mvs.pth` — how the
    reference actually fine-tunes mode 0 (train_ft.py resumes net_mvs;
    mvs_points_model.py:79). The checkpoint carries FeatureNet + premlp
    only; CostRegNet/ProbNet (the learned-depth stack, used only when
    manual_depth_view == -1) start fresh, exactly as in the reference
    where those weights don't exist in the DTU init."""
    from pointnerf2studio_tpu.models.mvsnet.featurenet import (
        load_fpn_params)

    p = load_fpn_params(best_net_mvs_path)
    premlp = p.pop("premlp", None)
    fresh = init_joint_params(key, num_views=num_views)
    return MvsParams(
        fpn=p,
        premlp=premlp if premlp is not None else fresh.premlp,
        costvol=fresh.costvol,
    )


def _premlp_apply(layers, x):
    for i, l in enumerate(layers):
        x = x @ l["kernel"] + l["bias"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def generate_points_diff(
    mvs: MvsParams,
    images: jnp.ndarray,       # [V, H, W, 3]
    intrinsics: jnp.ndarray,   # [V, 3, 3]
    w2cs: jnp.ndarray,         # [V, 4, 4]
    c2ws: jnp.ndarray,         # [V, 4, 4]
    near_far: jnp.ndarray,     # [2]
    key: Optional[jax.Array] = None,
    num_depth: int = 128,
    std_depth: float = 0.0,
    dprob_thresh: float = 0.8,
) -> Dict[str, jnp.ndarray]:
    """Differentiable point generation for the ref view (vid 0).

    Returns dict with xyz_w [N,3], embedding [N,C], color/dir [N,3],
    conf [N,1], valid [N] where N = (H/4)*(W/4). Mirrors
    gen_points(manual_depth_view=-1) + query_embedding
    (mvs_points_model.py:141-167,224-258,261-340) with pad=0.
    """
    V, H, W, _ = images.shape
    h, w = H // 4, W // 4
    near, far = near_far[0], near_far[1]

    feats_all = [fpn_features(mvs.fpn, images[v]) for v in range(V)]
    feats_top = jnp.stack([f[3] for f in feats_all])            # [V,h,w,32]

    # quarter-res projection matrices, src @ inv(ref)
    Kq = intrinsics.at[:, :2, :].multiply(0.25)
    proj = jnp.tile(jnp.eye(4)[None], (V, 1, 1))
    proj = proj.at[:, :3, :4].set(Kq @ w2cs[:, :3, :4])
    proj = proj @ jnp.linalg.inv(proj[0])

    imgs_q = images.reshape(V, h, 4, w, 4, 3).mean((2, 4))
    prob = depth_probability(
        mvs.costvol, imgs_q, feats_top, proj, (near, far),
        num_depth=num_depth, vid=0, pad=0)                      # [D, h, w]
    ndc_e, ndc_std, valid = expected_depth_std(prob, dprob_thresh)

    # mode -1 samples depth with the LEARNED per-pixel std (the prob
    # volume's spread — gau_single_sampler, mvs_points_model.py:156-167)
    if key is not None:
        ndc_z = ndc_e + ndc_std * jax.random.normal(key, ndc_e.shape)
    else:
        ndc_z = ndc_e
    ndc_z = jnp.clip(ndc_z, 0.0, 1.0)

    # unproject at FEATURE resolution pixels scaled to full-res coords
    # (depth2point uses normalized [0,1] pixel coords * (W-1),
    # mvs_points_model.py:170-181)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) / (h - 1) * (H - 1),
        jnp.arange(w, dtype=jnp.float32) / (w - 1) * (W - 1),
        indexing="ij")
    cam_z = ndc_z * (far - near) + near
    pix = jnp.stack([xx * cam_z, yy * cam_z, cam_z], -1)        # [h, w, 3]
    Kinv_t = jnp.linalg.inv(intrinsics[0]).T
    cam_xyz = (pix.reshape(-1, 3)) @ Kinv_t                     # [N, 3]

    # world points
    c2w0 = c2ws[0]
    xyz_w = cam_xyz @ c2w0[:3, :3].T + c2w0[:3, 3]

    # embedding: imgfeat_0_0123 / dir_0 / point_conf via the ref view
    feats0 = feats_all[0]
    pix_xy = (cam_xyz / cam_xyz[:, 2:3]) @ intrinsics[0].T
    xy = pix_xy[:, :2]
    inb = jnp.all((xy >= 0) & (xy <= jnp.array(
        [W - 1, H - 1], xy.dtype)), -1)
    gx = xy[:, 0] / ((W - 1) / 2.0) - 1.0
    gy = xy[:, 1] / ((H - 1) / 2.0) - 1.0
    grid2 = jnp.stack([gx, gy], -1)
    sampled = [bilinear_grid_sample(f, grid2, align_corners=True)
               * inb[:, None] for f in feats0]
    colors = sampled[0]
    emb_feats = jnp.concatenate(sampled[1:], -1)                # [N, 56]

    dirs = cam_xyz / (jnp.linalg.norm(cam_xyz, axis=-1, keepdims=True)
                      + 1e-6)
    dirs_w = dirs @ c2w0[:3, :3].T

    conf = jnp.ones_like(colors[:, :1])   # mode -1: no photometric conf
    embedding = _premlp_apply(
        mvs.premlp, jnp.concatenate([emb_feats, colors, dirs_w, conf], -1))

    valid = valid.reshape(-1) & inb & (cam_z.reshape(-1) > 0)
    return {"xyz": xyz_w, "embedding": embedding, "color": colors,
            "dir": dirs_w, "conf": conf, "valid": valid}


def make_joint_loss_fn(
    cfg: PointNerfConfig,
    ranges_min: np.ndarray,
    grid_dims: Tuple[int, int, int],
    num_depth: int = 128,
    dprob_thresh: float = 0.8,
) -> Callable:
    """loss_fn(mvs, fields, batch, kgen, krender) -> (total, aux).

    Exposed separately from the train step so tests can differentiate
    it directly (e.g. assert the ProbNet gradient is materially
    nonzero — the depth stack trains only through point xyz)."""
    q = cfg.query
    t = cfg.train
    rmin = jnp.asarray(ranges_min, jnp.float32)
    svsize = jnp.asarray(q.scaled_vsize, jnp.float32)

    def loss_fn(mvs, fields, batch: MVSTrainBatch, kgen, krender):
        gen = generate_points_diff(
            mvs, batch.images, batch.intrinsics, batch.w2cs,
            batch.c2ws, batch.near_far, key=kgen,
            num_depth=num_depth, dprob_thresh=dprob_thresh)
        # xyz stays IN the graph: the photometric loss reaches the
        # depth stack (CostRegNet/ProbNet) only through point
        # positions -> aggregation distances (inverse-distance
        # weights + sampled depth), matching reference feedforward
        # mode (neural_points.set_points keeps xyz differentiable).
        # Grid building voxelizes to integers and contributes no
        # gradient; K-NN/top_k selection indices are inherently
        # non-differentiable, so no stop_gradient is needed there.
        points = NeuralPointCloud(
            xyz=gen["xyz"],
            points_embeding=gen["embedding"],
            points_conf=gen["conf"],
            points_dir=gen["dir"],
            points_color=gen["color"],
            Rw2c=jnp.eye(3),
            alive=gen["valid"],
        )
        grid = build_grid(
            jax.lax.stop_gradient(points.xyz), points.alive, rmin,
            svsize, grid_dims, q.max_o, q.P, q.query_size)
        out = render_rays(
            fields, points, grid, batch.campos, batch.camrotc2w,
            batch.raydirs, near=batch.near_far[0],
            far=batch.near_far[1], cfg=cfg, key=krender,
            training=True)
        total, aux = compute_losses(out, batch.gt_rgb, t)
        return total, aux

    return loss_fn


def make_joint_train_step(
    cfg: PointNerfConfig,
    ranges_min: np.ndarray,
    grid_dims: Tuple[int, int, int],
    mvs_lr: float = 5e-4,
    num_depth: int = 128,
    dprob_thresh: float = 0.8,
) -> Callable:
    """Build the jitted joint step. Grid geometry must be fixed ahead
    (`compute_grid_geometry` over the scene ranges) so shapes stay
    static while generated points move."""
    t = cfg.train
    tx_mvs = optax.adam(mvs_lr)
    tx_fields = optax.adam(optax.exponential_decay(
        t.lr_fields, t.lr_decay_iters, t.lr_decay_exp))
    loss_impl = make_joint_loss_fn(
        cfg, ranges_min, grid_dims,
        num_depth=num_depth, dprob_thresh=dprob_thresh)

    @jax.jit
    def joint_step(state: JointState, batch: MVSTrainBatch,
                   key: jax.Array) -> Tuple[JointState, Dict]:
        kgen, krender = jax.random.split(key)

        def loss_fn(mvs, fields):
            return loss_impl(mvs, fields, batch, kgen, krender)

        (_, aux), (g_mvs, g_fields) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.mvs, state.fields)

        upd_m, opt_m = tx_mvs.update(g_mvs, state.opt_state_mvs, state.mvs)
        mvs = optax.apply_updates(state.mvs, upd_m)
        upd_f, opt_f = tx_fields.update(
            g_fields, state.opt_state_fields, state.fields)
        fields = optax.apply_updates(state.fields, upd_f)

        return state.replace(
            mvs=mvs, fields=fields,
            opt_state_mvs=opt_m, opt_state_fields=opt_f,
            step=state.step + 1), aux

    return joint_step


def create_joint_state(key, fields: AggregatorParams,
                       cfg: PointNerfConfig, num_views: int = 3,
                       mvs_lr: float = 5e-4,
                       mvs: Optional[MvsParams] = None) -> JointState:
    if mvs is None:
        mvs = init_joint_params(key, num_views=num_views)
    t = cfg.train
    tx_mvs = optax.adam(mvs_lr)
    tx_fields = optax.adam(optax.exponential_decay(
        t.lr_fields, t.lr_decay_iters, t.lr_decay_exp))
    return JointState(
        mvs=mvs, fields=fields,
        opt_state_mvs=tx_mvs.init(mvs),
        opt_state_fields=tx_fields.init(fields),
        step=jnp.zeros((), jnp.int32),
    )

"""Golden parity against the REFERENCE'S OWN torch code, executed.

The other golden tests compare against a NumPy model written from the
same spec — this file removes the "both sides misread the spec" failure
mode by importing and running the reference modules directly:

  * `models/aggregators/point_aggregators.py` `viewmlp`
    (/root/reference/pointnerf, lines 486-662) with the shipped
    `best_net_ray_marching.pth` weights as the oracle for per-slot
    (sigma, rgb) at chair hyperparameters, vs our decode_radiance with
    the same weights imported through checkpoint_io.
  * `models/rendering/diff_ray_marching.py` `ray_march` (:495-541) as
    the oracle for alpha compositing, vs ops/compositing.

One documented, deliberate difference: the legacy `viewmlp` activates
with torch's default LeakyReLU slope 0.01, while the nerfstudio stack
this repo mirrors uses LeakyReLU(0.1) everywhere
(studio_model.py:197-218) — the oracle module's activations are set to
slope 0.1 so the comparison isolates the shared math (concat order,
masking, PE formula, weight application, raw2out activations).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

# Opt-in gate (ADVICE r3): these tests EXECUTE code from the untrusted
# public reference checkout (/root/reference). The default suite never
# runs it; set PN2S_RUN_REFERENCE_ORACLE=1 for the golden-parity pass.
if not os.environ.get("PN2S_RUN_REFERENCE_ORACLE"):
    pytest.skip(
        "reference-oracle tests execute the untrusted /root/reference "
        "checkout; opt in with PN2S_RUN_REFERENCE_ORACLE=1",
        allow_module_level=True)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.models.aggregator import decode_radiance
from pointnerf2studio_tpu.utils.checkpoint_io import (
    import_aggregator_params, load_torch_state_dict)

# the torch oracle computes true-f32 matmuls; jax's default matmul
# precision is bf16-like even on CPU in this build (this file runs in
# its own xdist worker, so the setting stays local to these tests)
jax.config.update("jax_default_matmul_precision", "highest")

REF = "/root/reference/pointnerf"
CKPT = (REF + "/mvsnet_checkpoints/init/"
        "dtu_dgt_d012_img0123_conf_agg2_32_dirclr20/"
        "best_net_ray_marching.pth")

# chair aggregator hyperparameters
# (reference dev_scripts/w_n360/chair_points.sh:36-105 + options
# defaults; shading_color_channel_num/view_ori/point_hyper_dim from
# options/base_options.py defaults)
CHAIR_OPT = dict(
    act_type="LeakyReLU", act_super=1,
    agg_distance_kernel="linear", agg_intrp_order=2, agg_dist_pers=20,
    agg_axis_weight=None, agg_weight_norm=1,
    agg_feat_xyz_mode="None", agg_alpha_xyz_mode="None",
    agg_color_xyz_mode="None",
    point_features_dim=32, point_hyper_dim=256,
    point_color_mode="1", point_dir_mode="1",
    num_pos_freqs=10, num_viewdir_freqs=4, num_feat_freqs=3,
    dist_xyz_freq=5, dist_xyz_deno=0,
    shading_feature_mlp_layer1=2, shading_feature_mlp_layer2=0,
    shading_feature_mlp_layer3=2, shading_feature_num=256,
    shading_alpha_mlp_layer=1, shading_color_mlp_layer=4,
    shading_color_channel_num=3, apply_pnt_mask=1,
    weight_feat_dim=8, weight_xyz_freq=2, sh_degree=4, view_ori=0,
)


def _stub_nerfstudio():
    """The reference modules import nerfstudio symbols that the code
    under test never calls (an encoding class, a tcnn warning printer);
    nerfstudio is not installed here, so stub exactly those."""
    if "nerfstudio.field_components.encodings" in sys.modules:
        return
    ns = types.ModuleType("nerfstudio")
    ns.__path__ = []                      # make it package-like
    fc = types.ModuleType("nerfstudio.field_components")
    enc = types.ModuleType("nerfstudio.field_components.encodings")
    enc.NeRFEncoding = type("NeRFEncoding", (), {})
    ut = types.ModuleType("nerfstudio.utils")
    pr = types.ModuleType("nerfstudio.utils.printing")
    pr.print_tcnn_speed_warning = lambda *a, **k: None
    sys.modules.update({
        "nerfstudio": ns, "nerfstudio.field_components": fc,
        "nerfstudio.field_components.encodings": enc,
        "nerfstudio.utils": ut, "nerfstudio.utils.printing": pr})
    # the reference's utils/spherical.py imports scipy names removed in
    # modern scipy; restore legacy aliases (only SphericalHarm's
    # precompute uses them, and only under the sh_intrp kernel)
    import scipy.special as S
    if not hasattr(S, "sph_harm"):
        S.sph_harm = lambda m, n, theta, phi: S.sph_harm_y(
            n, m, phi, theta)
    if not hasattr(S, "lpmn"):
        S.lpmn = None   # unused at import time; sh_intrp-only


@pytest.fixture(scope="module")
def ref_agg():
    """The reference PointAggregator, imported from /root/reference and
    loaded with the shipped chair-era MLP weights."""
    # the module imports nerfstudio at top level for an encoding class
    # viewmlp never touches — stub it (nerfstudio is not installed)
    _stub_nerfstudio()
    if REF not in sys.path:
        sys.path.insert(0, REF)   # `models.*`, `utils.spherical`
    pa = importlib.import_module("models.aggregators.point_aggregators")
    opt = types.SimpleNamespace(**CHAIR_OPT)
    agg = pa.PointAggregator(opt)
    # align activations with the studio stack's LeakyReLU(0.1) (see
    # module docstring)
    for m in agg.modules():
        if isinstance(m, torch.nn.LeakyReLU):
            m.negative_slope = 0.1
    sd = torch.load(CKPT, map_location="cpu")
    agg_sd = {k[len("aggregator."):]: v for k, v in sd.items()
              if k.startswith("aggregator.")}
    missing, unexpected = agg.load_state_dict(agg_sd, strict=False)
    assert not unexpected, unexpected
    assert not [m for m in missing if not m.startswith("feat_weight")]
    return agg.eval()


def _inputs(rng, R=12, SR=4, K=8):
    total = R * SR
    ray_valid = rng.random(total) < 0.8
    ray_valid[0] = False
    ray_valid[1] = True
    pnt_mask = (rng.random((total, K)) < 0.7) & ray_valid[:, None]
    pnt_mask[ray_valid, 0] = True              # every valid slot has K>=1
    # realistic magnitudes (trained-embedding scale, voxel-scale
    # offsets): huge activations saturate sigmoid and blow sigma into
    # the 1e4 range where f32 tolerance checks are meaningless
    emb = rng.standard_normal((total, K, 32)).astype(np.float32) * 0.05
    color = rng.random((total, K, 3)).astype(np.float32)
    pdir = rng.standard_normal((total, K, 3)).astype(np.float32)
    pdir /= np.linalg.norm(pdir, axis=-1, keepdims=True)
    conf = rng.random((total, K, 1)).astype(np.float32)
    dists = (rng.standard_normal((total, K, 6)) * 0.004).astype(
        np.float32)
    vdir = rng.standard_normal((total, 3)).astype(np.float32)
    vdir /= np.linalg.norm(vdir, axis=-1, keepdims=True)
    # masked inverse-distance weights, normalized over K (the weight is
    # computed OUTSIDE viewmlp in the reference; both sides consume the
    # same array so the tower math is what the test isolates)
    w = pnt_mask / np.maximum(np.linalg.norm(dists[..., :3], axis=-1),
                              1e-6)
    w = (w / np.maximum(w.sum(-1, keepdims=True), 1e-8)).astype(
        np.float32)
    return ray_valid, pnt_mask, emb, color, pdir, conf, dists, vdir, w


@pytest.mark.parametrize("rot", ["identity", "random"])
def test_viewmlp_oracle(ref_agg, rot):
    rng = np.random.default_rng(42)
    R, SR, K = 12, 4, 8
    total = R * SR
    (ray_valid, pnt_mask, emb, color, pdir, conf, dists, vdir,
     w) = _inputs(rng, R, SR, K)
    if rot == "identity":
        Rw2c_ref = np.eye(3, dtype=np.float32)
    else:
        # a proper rotation; the reference applies x @ Rw2c^T
        # (viewmlp transposes at entry, point_aggregators.py:509)
        th = 0.7
        Rw2c_ref = np.array([[np.cos(th), -np.sin(th), 0],
                             [np.sin(th), np.cos(th), 0],
                             [0, 0, 1]], np.float32)
    vsize = np.array([0.008, 0.008, 0.008], np.float32)

    def t(x):
        return torch.from_numpy(np.asarray(x))

    with torch.no_grad():
        out_ref, _ = ref_agg.viewmlp(
            t(color).view(1, R, SR, K, 3),
            t(Rw2c_ref),
            t(pdir).view(1, R, SR, K, 3),
            t(conf).view(1, R, SR, K, 1),
            t(emb).view(1, R, SR, K, 32),
            None, None,
            t(pnt_mask).view(1, R, SR, K),
            None,
            t(np.zeros((total, 3), np.float32)).view(1, R, SR, 3),
            t(vdir).view(1, R, SR, 3),
            vsize,
            t(w).view(1, R, SR, K),
            total,
            t(ray_valid),
            t(dists).view(1, R, SR, K, 6),
        )
    out_ref = out_ref.numpy()                    # [total, 4]

    sd = load_torch_state_dict(CKPT)
    params = import_aggregator_params(sd)
    # act_super=True matches the legacy chair script (the repo default
    # False mirrors the studio stack's default, studio_model.py:96)
    cfg = AggregatorConfig(compute_dtype="float32", act_super=True)
    # our convention stores the matrix that right-multiplies row
    # vectors (x @ Rw2c), i.e. the TRANSPOSE of the reference
    # checkpoint tensor — checkpoint_io transposes on import/export
    Rw2c_ours = jnp.asarray(Rw2c_ref.T)
    vd_rot = vdir @ Rw2c_ref.T                   # decode expects rotated
    sigma, rgb = decode_radiance(
        params, cfg,
        neigh_emb=jnp.asarray(emb), neigh_color=jnp.asarray(color),
        neigh_dir=jnp.asarray(pdir), dists=jnp.asarray(dists),
        weight=jnp.asarray(w), pnt_mask=jnp.asarray(pnt_mask),
        viewdirs=jnp.asarray(vd_rot), Rw2c=Rw2c_ours)

    sel = ray_valid
    np.testing.assert_allclose(np.asarray(sigma)[sel], out_ref[sel, 0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb)[sel], out_ref[sel, 1:4],
                               rtol=1e-4, atol=1e-4)


def test_ray_march_oracle():
    """Our compositing vs the reference's executed ray_march
    (diff_ray_marching.py:495-541): opacity, exclusive-cumprod
    transmittance, blend weights, background blending."""
    _stub_nerfstudio()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    drm = importlib.import_module("models.rendering.diff_ray_marching")
    drf = importlib.import_module("models.rendering.diff_render_func")

    rng = np.random.default_rng(3)
    R, S = 16, 24
    ray_dist = (rng.random((1, R, S)) * 0.01 + 1e-4).astype(np.float32)
    ray_valid = rng.random((1, R, S)) < 0.6
    feats = np.concatenate(
        [np.abs(rng.standard_normal((1, R, S, 1)) * 30),
         rng.random((1, R, S, 3))], -1).astype(np.float32)
    bg = np.array([[1.0, 1.0, 1.0]], np.float32)

    with torch.no_grad():
        ray_color, _, opa_ref, trans_ref, blend_ref, *_ = drm.ray_march(
            torch.from_numpy(ray_dist), torch.from_numpy(ray_valid),
            torch.from_numpy(feats), drf.radiance_render,
            drf.alpha_blend, torch.from_numpy(bg))

    from pointnerf2studio_tpu.ops.compositing import BLEND_FUNCTIONS
    sig = jnp.asarray(feats[0, ..., 0] * ray_valid[0])
    opacity = 1.0 - jnp.exp(-sig * jnp.asarray(ray_dist[0]))
    trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    bg_trans = trans[:, -1:]
    trans = jnp.concatenate(
        [jnp.ones((R, 1), jnp.float32), trans[:, :-1]], -1)
    blend = BLEND_FUNCTIONS["alpha"](opacity, trans)
    color = (jnp.sum(blend[..., None] * jnp.asarray(feats[0, ..., 1:4]),
                     -2) + bg_trans * jnp.asarray(bg))

    np.testing.assert_allclose(np.asarray(opacity), opa_ref[0].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(blend),
                               blend_ref[0, ..., 0].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(color), ray_color[0].numpy(),
                               rtol=1e-5, atol=1e-5)

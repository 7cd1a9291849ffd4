"""Point-generation depth modes: GT depth (manual_depth_view=0) and the
far_plane_shift background sheet (filter_utils.py:275-283).

Synthetic rig: three axis-aligned cameras viewing a fronto-parallel
plane at depth 2; ground-truth depth maps drive the unprojection, so
accepted points must land on the plane and consistency filtering must
keep them (reference mvs_points_model.py:290-293).
"""

import os

import numpy as np
import pytest

from pointnerf2studio_tpu.models.mvsnet.featurenet import load_fpn_params
from pointnerf2studio_tpu.models.mvsnet.pointgen import (
    MVSViewBatch, PointGenConfig, generate_point_cloud)

FPN_CKPT = ("/root/reference/pointnerf/mvsnet_checkpoints/init/"
            "dtu_dgt_d012_img0123_conf_agg2_32_dirclr20/best_net_mvs.pth")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FPN_CKPT), reason="reference FPN ckpt absent")

H = W = 32
PLANE_Z = 2.0


def _rig(with_bg_holes: bool):
    rng = np.random.default_rng(0)
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]],
                 np.float32)
    batches = []
    for tx in (0.0, 0.08, -0.08):
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = -tx                      # camera at (tx, 0, 0), +z
        depth = np.full((H, W), PLANE_Z, np.float32)
        if with_bg_holes:
            depth[:8, :] = 5.0               # beyond far -> rejected
        imgs = rng.random((3, H, W, 3)).astype(np.float32)
        # per-batch views: ref first, then the two others (poses only
        # matter for the ref view here; gt mode skips MVS warping)
        batches.append(MVSViewBatch(
            images=imgs,
            intrinsics=np.tile(K, (3, 1, 1)),
            w2cs=np.tile(w2c, (3, 1, 1)),
            c2ws=np.tile(np.linalg.inv(w2c), (3, 1, 1)),
            near_far_depth=(1.0, 3.0),
            near_far=(1.0, 3.0),
            gt_depth=depth,
        ))
    return batches


@pytest.fixture(scope="module")
def fpn():
    return load_fpn_params(FPN_CKPT)


def test_gt_depth_mode(fpn):
    cfg = PointGenConfig(depth_mode="gt", vox_res=0, std_depth=0.0)
    out = generate_point_cloud(None, fpn, _rig(False), cfg=cfg)
    xyz = out["xyz"]
    assert xyz.shape[0] > 0.9 * 3 * H * W    # nearly every pixel kept
    # averaged-depth fusion keeps the plane
    np.testing.assert_allclose(xyz[:, 2], PLANE_Z, atol=0.05)


def test_gt_depth_requires_map(fpn):
    vbs = _rig(False)
    vbs[0].gt_depth = None
    with pytest.raises(ValueError, match="gt_depth"):
        generate_point_cloud(
            None, fpn, vbs[:1],
            cfg=PointGenConfig(depth_mode="gt", vox_res=0))


def test_far_plane_shift_sheet(fpn):
    cfg = PointGenConfig(depth_mode="gt", vox_res=0,
                         far_plane_shift=4.0)
    out = generate_point_cloud(None, fpn, _rig(True), cfg=cfg)
    xyz = out["xyz"]
    plane = np.abs(xyz[:, 2] - PLANE_Z) < 0.05
    sheet = np.abs(xyz[:, 2] - (3.0 + 4.0)) < 0.05   # far + shift
    assert plane.sum() > 0.6 * 3 * H * W
    # every rejected pixel (8 rows x W per view) becomes a sheet point
    assert sheet.sum() >= 3 * 8 * W
    assert plane.sum() + sheet.sum() == xyz.shape[0]

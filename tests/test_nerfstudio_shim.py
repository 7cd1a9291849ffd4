"""ns-train surface shim: the studio->TPU config mapping must work
without nerfstudio installed; the MethodSpecification degrades with a
clear error when the extra is missing."""

import pytest

from pointnerf2studio_tpu import nerfstudio_shim as shim


def test_studio_config_maps_to_tpu_tree():
    cfg = shim.studio_to_tpu_config(
        vsize=[0.008, 0.008, 0.008], vscale=[2, 2, 2],
        kernel_size=[5, 5, 5], SR=24, K=8, max_o=610_000,
        z_depth_dim=400, ranges=[-1.0, -1.0, -1.0, 1.0, 1.0, 1.0],
        num_feat_freqs=3, hidden_size=256, point_features_dim=32,
        eval_num_rays_per_chunk=2304,
        zero_one_loss_weights=1e-4)
    assert cfg.query.vsize == (0.008, 0.008, 0.008)
    assert cfg.query.kernel_size == (5, 5, 5)
    assert cfg.query.SR == 24 and cfg.query.max_o == 610_000
    assert cfg.agg.num_feat_freqs == 3
    assert cfg.eval_num_rays_per_chunk == 2304
    assert cfg.train.zero_one_loss_weight == 1e-4
    # tuple fields converted to the dataclass's tuple types
    assert isinstance(cfg.query.vscale[0], int)


def test_unknown_field_rejected():
    with pytest.raises(TypeError, match="unknown studio config field"):
        shim.studio_to_tpu_config(not_a_field=3)


def test_method_spec_needs_nerfstudio():
    try:
        import nerfstudio  # noqa: F401
        has_ns = True
    except ImportError:
        has_ns = False
    if has_ns:
        spec = shim.pointnerf_original
        assert spec.config.method_name == "pointnerf-original"
    else:
        with pytest.raises(ImportError, match="studio"):
            shim.pointnerf_original

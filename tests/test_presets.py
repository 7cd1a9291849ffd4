"""Per-scene preset families resolve and carry the reference's
hyperparameters (dev_scripts/{w_n360,w_colmap_n360,w_scannet_etf,
w_tt_ft}/*.sh)."""

from pointnerf2studio_tpu.data import presets


def test_all_families_resolve():
    for name in (presets.NERF_SYNTH_SCENES + presets.COLMAP_SCENES
                 + presets.SCANNET_SCENES + presets.TT_SCENES):
        cfg = presets.get_preset(name)
        assert cfg.query.K == 8


def test_nerf_synth_chair_values():
    cfg = presets.get_preset("chair")
    assert cfg.query.vsize == (0.004, 0.004, 0.004)
    assert cfg.query.SR == 80 and cfg.query.z_depth_dim == 400
    assert cfg.query.max_o == 410_000
    assert cfg.train.rays_per_batch == 4096
    assert cfg.train.prune_thresh == 0.1


def test_colmap_family_diffs():
    # col_chair_points.sh: prune off (prune_iter=-1), prob_num_step=50,
    # prob_mul=0.4, random_sample_size=70 -> 4900 rays/batch
    cfg = presets.get_preset("col_chair")
    assert cfg.train.prune_iter == 0
    assert cfg.train.prob_num_step == 50
    assert cfg.train.prob_mul == 0.4
    assert cfg.train.rays_per_batch == 70 * 70
    # same grid family as w_n360
    assert cfg.query.vsize == (0.004, 0.004, 0.004)
    assert cfg.query.ranges == (-0.721, -0.695, -0.995,
                                0.658, 0.706, 1.050)
    # col_ficus ranges differ from the GT-camera ficus ranges
    assert (presets.get_preset("col_ficus").query.ranges
            != presets.get_preset("ficus").query.ranges)

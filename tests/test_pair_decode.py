"""decode_mode="pair" (valid-pair-packed decode tail) vs the lane
layout: identical masks, colors within the segment-sum reduction-order
tolerance, pb_overflow exact-with-counter semantics.

The pair path is the TPU form of the reference's masked_select
compaction before its MLP tower (studio_model.py:310-315): only valid
(slot, K) pairs reach the per-neighbor GEMMs.
"""

import dataclasses

import numpy as np
import pytest

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays_jit, make_fast_scene)


def _cfg(**q):
    cfg = sphere_config(sr=16, d=48)
    return dataclasses.replace(
        cfg, query=dataclasses.replace(cfg.query, ray_slot_budget=16,
                                       **q))


@pytest.fixture(scope="module")
def scene():
    return make_sphere_scene(n_points=4000, cfg=_cfg())


def _render(s, cfg):
    cache, rmin, svs = make_fast_scene(cfg, s.cloud, s.grid,
                                       params=s.params)
    rays = camera_rays(s.campos, s.camrotc2w, 24, 24, 18.0)
    return fast_render_rays_jit(
        s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
        s.near, s.far, cfg, rmin, svs)


def _assert_match(ref, out, tol=2e-2, mean_tol=1e-3):
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    m = np.asarray(ref.ray_mask)
    diff = np.abs(np.asarray(out.coarse_raycolor)
                  - np.asarray(ref.coarse_raycolor))[m]
    assert diff.max() < tol, diff.max()
    assert diff.mean() < mean_tol, diff.mean()


@pytest.mark.parametrize("extract_mode", ["onehot", "krows"])
def test_pair_matches_lanes(scene, extract_mode):
    s = scene
    ref = _render(s, _cfg(extract_mode=extract_mode))
    out = _render(s, _cfg(extract_mode=extract_mode,
                          decode_mode="pair", pair_budget=8))
    assert out.pb_overflow is None      # budget == K: cannot overflow
    _assert_match(ref, out)


def test_pair_budget_counter(scene):
    """A generous budget reports 0; a starved one trips the counter."""
    s = scene
    ok = _render(s, _cfg(decode_mode="pair", pair_budget=6))
    assert int(ok.pb_overflow) == 0
    _assert_match(_render(s, _cfg()), ok)

    # a starved budget on a dense compacted axis (small compact_budget
    # packs valid slots densely) must trip the counter
    starved = _render(s, _cfg(decode_mode="pair", pair_budget=1,
                              compact_budget=4))
    assert int(starved.pb_overflow) > 0


def test_pair_order1_and_count_norm(scene):
    """agg_intrp_order=1 and a count-normalized kernel exercise the
    segment-normalization branches."""
    s = scene
    for agg_kw in ({"agg_intrp_order": 1},
                   {"agg_distance_kernel": "numlinear"}):
        base = _cfg()
        base = dataclasses.replace(
            base, agg=dataclasses.replace(base.agg, **agg_kw))
        pair = dataclasses.replace(
            base, query=dataclasses.replace(
                base.query, decode_mode="pair", pair_budget=8))
        _assert_match(_render(s, base), _render(s, pair))


def test_pair_with_ray_budget_and_base_cache(scene):
    """pair composes with the rb packing front-end and base_cache."""
    s = scene
    ref = _render(s, _cfg())
    out = _render(s, _cfg(decode_mode="pair", pair_budget=6,
                          ray_budget=500))
    assert int(out.rb_overflow) == 0
    _assert_match(ref, out)

    out_bh = _render(s, _cfg(decode_mode="pair", pair_budget=6,
                             base_cache=True))
    _assert_match(ref, out_bh, tol=4e-2)


def test_pair_rejects_ineligible(scene):
    s = scene
    cfg = _cfg(decode_mode="pair")
    cfg = dataclasses.replace(
        cfg, agg=dataclasses.replace(cfg.agg, agg_intrp_order=0,
                                     point_color_mode=False,
                                     point_dir_mode=False))
    with pytest.raises(ValueError, match="agg_intrp_order"):
        _render(s, cfg)

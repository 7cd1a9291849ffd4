"""Ray-generation variants + PDF importance resampling.

Semantics from reference pointnerf/models/rendering/diff_ray_marching.py
(:85-141 near-middle-far, :144-192 disparity, :36-82 sample_pdf,
:383-417 refine).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.ops.raygen import (
    near_far_disparity_linear_ray_generation,
    near_far_linear_ray_generation,
    near_middle_far_ray_generation,
    refine_ray_generation,
    sample_pdf,
)

CAMPOS = jnp.zeros(3)
RD = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))


class TestDisparity:
    def test_matches_closed_form(self):
        rp, seg, ts = near_far_disparity_linear_ray_generation(
            CAMPOS, RD, 8, near=0.5, far=5.0)
        t = np.linspace(0, 1, 9)
        bounds = 1.0 / (1.0 / 0.5 * (1 - t) + 1.0 / 5.0 * t)
        mids = 0.5 * (bounds[1:] + bounds[:-1])
        np.testing.assert_allclose(np.asarray(ts)[0], mids, rtol=1e-5)
        # disparity sampling: early segments shorter than late ones
        s = np.asarray(seg)[0]
        assert s[0] < s[-1]

    def test_positions_on_ray(self):
        rp, _, ts = near_far_disparity_linear_ray_generation(
            CAMPOS, RD, 8, near=0.5, far=5.0)
        np.testing.assert_allclose(np.asarray(rp)[..., 2], np.asarray(ts),
                                   rtol=1e-6)
        assert np.allclose(np.asarray(rp)[..., :2], 0)


class TestNearMiddleFar:
    def test_split_structure(self):
        _, seg, ts = near_middle_far_ray_generation(
            CAMPOS, RD, 10, near=0.5, middle=2.0, far=8.0,
            middle_split=0.6)
        ts = np.asarray(ts)[0]
        assert ts[0] > 0.5 and ts[-1] < 8.0
        assert np.all(np.diff(ts) > 0)
        # the linear section has ~constant segments; disparity tail grows
        s = np.asarray(seg)[0]
        assert s[-1] > s[0]


class TestSamplePdf:
    def test_concentrates_samples_at_weight_peak(self):
        _, _, ts = near_far_linear_ray_generation(CAMPOS, RD, 32, 0.5, 5.0)
        w = jnp.exp(-((ts - 2.0) ** 2) / 0.005)
        new_ts = sample_pdf(ts, w, 16, det=True)
        assert new_ts.shape == (4, 16 + 32)
        mid = np.asarray(new_ts)[0]
        # sorted output
        assert np.all(np.diff(mid) >= 0)
        # 48 merged values = 32 uniform originals (~4 in the window)
        # + 16 importance samples (mostly in the window)
        frac_near_peak = np.mean(np.abs(mid - 2.0) < 0.3)
        assert frac_near_peak > 0.25

    def test_stochastic_with_key(self):
        _, _, ts = near_far_linear_ray_generation(CAMPOS, RD, 16, 0.5, 5.0)
        w = jnp.ones_like(ts)
        a = sample_pdf(ts, w, 8, det=False, key=jax.random.PRNGKey(0))
        b = sample_pdf(ts, w, 8, det=False, key=jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestRefine:
    def test_fixed_output_shape_and_peak(self):
        _, _, ts = near_far_linear_ray_generation(CAMPOS, RD, 32, 0.5, 5.0)
        w = jnp.exp(-((ts - 2.0) ** 2) / 0.005)
        rp, seg, mts = refine_ray_generation(CAMPOS, RD, 24, ts, w)
        assert rp.shape == (4, 24, 3)
        assert seg.shape == (4, 24)
        assert np.all(np.asarray(seg) >= 0)
        assert np.all(np.diff(np.asarray(mts)[0]) >= 0)

"""Unit tests for encodings, ray generation, camera math, compositing.

Each op is checked against a tiny independent NumPy reference that
follows the reference semantics documented in SURVEY.md §2/§3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.ops.encoding import positional_encoding
from pointnerf2studio_tpu.ops.raygen import near_far_linear_ray_generation
from pointnerf2studio_tpu.ops.camera import w2pers, world_to_cam
from pointnerf2studio_tpu.ops.compositing import (
    alpha_composite, ray_dist_from_sample_z)


class TestPositionalEncoding:
    def test_interleaved_layout(self, rng):
        x = rng.standard_normal((5, 2)).astype(np.float32)
        out = np.asarray(positional_encoding(jnp.asarray(x), 3, ori=False))
        assert out.shape == (5, 2 * 3 * 2)
        # channel-major frequencies, sin/cos adjacent per (channel, freq)
        expect = []
        for c in range(2):
            for f in range(3):
                expect.append(np.sin(x[:, c] * 2.0 ** f))
                expect.append(np.cos(x[:, c] * 2.0 ** f))
        np.testing.assert_allclose(out, np.stack(expect, -1), rtol=1e-6)

    def test_ori_layout(self, rng):
        x = rng.standard_normal((4, 3)).astype(np.float32)
        out = np.asarray(positional_encoding(jnp.asarray(x), 4, ori=True))
        assert out.shape == (4, 3 + 2 * 3 * 4)
        np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
        scaled = (x[..., None] * 2.0 ** np.arange(4)).reshape(4, 12)
        np.testing.assert_allclose(out[:, 3:15], np.sin(scaled), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 15:], np.cos(scaled), rtol=1e-5, atol=1e-6)

    def test_zero_freqs(self):
        x = jnp.ones((2, 3))
        assert positional_encoding(x, 0, ori=False).shape == (2, 0)
        np.testing.assert_array_equal(positional_encoding(x, 0, ori=True), x)

    def test_pe_recurrence_matches(self, rng):
        # angle-doubling mode: same layout, within the documented
        # ~1e-3 f32 error envelope of direct at F=10, both ori modes
        # (at F=10 with |x|~16 the args reach ~8e3 rad where direct's
        # own range reduction carries ~arg*eps error too)
        x = (4.0 * rng.standard_normal((257, 5))).astype(np.float32)
        for ori in (False, True):
            direct = np.asarray(positional_encoding(
                jnp.asarray(x), 10, ori=ori))
            rec = np.asarray(positional_encoding(
                jnp.asarray(x), 10, ori=ori, mode="rec"))
            assert rec.shape == direct.shape
            np.testing.assert_allclose(rec, direct, atol=1e-3)

    def test_pe_recurrence_bf16_input(self, rng):
        # the hot path feeds bf16 inputs; rec upcasts to f32 for the
        # recurrence and must stay within bf16 rounding of direct-on-f32
        x = rng.standard_normal((64, 6)).astype(np.float32)
        xb = jnp.asarray(x).astype(jnp.bfloat16)
        rec = np.asarray(positional_encoding(
            xb, 5, mode="rec").astype(jnp.float32))
        direct = np.asarray(positional_encoding(
            jnp.asarray(np.asarray(xb.astype(jnp.float32))), 5))
        np.testing.assert_allclose(rec, direct, atol=1.6e-2)


class TestRayGeneration:
    def test_no_jitter_midpoints(self):
        campos = jnp.zeros(3)
        raydir = jnp.array([[0.0, 0.0, 1.0]])
        raypos, seg, ts = near_far_linear_ray_generation(
            campos, raydir, 4, near=2.0, far=6.0)
        np.testing.assert_allclose(ts[0], [2.5, 3.5, 4.5, 5.5], rtol=1e-6)
        np.testing.assert_allclose(seg[0], [1.0] * 4, rtol=1e-6)
        np.testing.assert_allclose(raypos[0, :, 2], [2.5, 3.5, 4.5, 5.5], rtol=1e-6)

    def test_jitter_stays_in_bounds_and_deterministic(self):
        key = jax.random.PRNGKey(0)
        campos = jnp.zeros(3)
        raydir = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
        p1, s1, _ = near_far_linear_ray_generation(
            campos, raydir, 64, near=1.0, far=3.0, jitter=0.3, key=key)
        p2, s2, _ = near_far_linear_ray_generation(
            campos, raydir, 64, near=1.0, far=3.0, jitter=0.3, key=key)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        base = 2.0 / 64
        assert np.all(np.asarray(s1) > base * (1 - 0.16))
        assert np.all(np.asarray(s1) < base * (1 + 0.16))
        # samples strictly increasing along the ray
        assert np.all(np.diff(np.asarray(p1)[..., 2], axis=-1) > 0)


class TestCamera:
    def test_w2pers_roundtrip(self, rng):
        # random rotation via QR
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        campos = rng.standard_normal(3).astype(np.float32)
        pts = (rng.standard_normal((10, 3)) + np.array([0, 0, 5.0])).astype(np.float32)
        world = (q @ pts.T).T + campos  # place points in front of camera
        cam = np.asarray(world_to_cam(
            jnp.asarray(world), jnp.asarray(q, jnp.float32), jnp.asarray(campos)))
        np.testing.assert_allclose(cam, pts, rtol=1e-4, atol=1e-4)
        pers = np.asarray(w2pers(
            jnp.asarray(world), jnp.asarray(q, jnp.float32), jnp.asarray(campos)))
        np.testing.assert_allclose(pers[:, 2], pts[:, 2], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pers[:, 0], pts[:, 0] / pts[:, 2], rtol=1e-3, atol=1e-4)


class TestCompositing:
    def test_ray_dist_cummax_and_clamp(self):
        z = jnp.array([[1.0, 1.1, 1.05, 1.5]])  # non-monotone + big gap
        valid = jnp.ones((1, 4), bool)
        vz = 0.1
        d = np.asarray(ray_dist_from_sample_z(z, valid, vz))
        # cummax -> [1.0, 1.1, 1.1, 1.5]; diffs [0.1, 0.0, 0.4] + [vz]
        # 0.0 -> vz (degenerate), 0.4 > 2*vz -> vz
        np.testing.assert_allclose(d[0], [0.1, vz, vz, vz], rtol=1e-6)

    def test_invalid_slots_zeroed(self):
        z = jnp.array([[1.0, 2.0]])
        valid = jnp.array([[True, False]])
        d = np.asarray(ray_dist_from_sample_z(z, valid, 0.5))
        assert d[0, 1] == 0.0

    def test_alpha_composite_against_numpy(self, rng):
        sigma = np.abs(rng.standard_normal((3, 8))).astype(np.float32)
        rgb = rng.uniform(size=(3, 8, 3)).astype(np.float32)
        dist = rng.uniform(0.01, 0.1, size=(3, 8)).astype(np.float32)
        bg = np.array([1.0, 1.0, 1.0], np.float32)
        color, acc = alpha_composite(
            jnp.asarray(sigma), jnp.asarray(rgb), jnp.asarray(dist), jnp.asarray(bg))
        op = 1 - np.exp(-sigma * dist)
        tr = np.cumprod(1 - op + 1e-10, axis=-1)
        tr = np.concatenate([np.ones((3, 1)), tr[:, :-1]], axis=-1)
        w = op * tr
        expect = (w[..., None] * rgb).sum(-2) + (1 - w.sum(-1))[..., None] * bg
        np.testing.assert_allclose(np.asarray(color), expect, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc), w.sum(-1), rtol=1e-4, atol=1e-5)

    def test_zero_sigma_gives_background(self):
        color, acc = alpha_composite(
            jnp.zeros((2, 4)), jnp.zeros((2, 4, 3)), jnp.full((2, 4), 0.1),
            jnp.array([1.0, 0.5, 0.25]))
        np.testing.assert_allclose(
            np.asarray(color), np.tile([1.0, 0.5, 0.25], (2, 1)), rtol=1e-5)

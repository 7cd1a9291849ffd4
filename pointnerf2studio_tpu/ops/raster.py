"""Sort-based tile-binning raster front-end for frame rendering.

Replaces the per-chunk distance-field ray march (ops/march.py) with ONE
frame-level program that rasterizes the occupied query voxels onto the
pixel grid and bins the resulting samples per ray — the design priced
in PERF.md r5b (sorts are ~2.3 ns/row on v5e while the march's
table-walk work is row-issue-bound):

  1. project each query voxel's 8 corners; conservative pixel bbox +
     depth-bin range (perspective projection of a convex box attains
     its screen extrema at vertices; distances along normalized rays
     attain extrema at the AABB's closest point / farthest corner);
  2. partition voxels into footprint CLASSES (static per-class emit
     budgets — a single worst-case budget would 3x the row count);
  3. enumerate (pixel, depth-bin) offsets per voxel — broadcast, no
     per-row gathers — and BAND-verify each sample with inline
     recomputed ray directions: accept iff the sample position lands
     inside the voxel EXPANDED by a tolerance band that dominates any
     f32/FMA discrepancy between the inline formula and the frame's
     actual ray array (recompilations of the same formula measurably
     differ in the last ulp — XLA contracts FMAs differently per
     program — so a bitwise contract here would be fragile);
  4. one sort by (ray << 9 | d) compacts accepted samples to a prefix
     and orders them per ray by ascending depth;
  5. the EXACT verify runs on the bounded prefix only: gather each
     row's TRUE ray direction from the frame array (a few-M-row
     gather is affordable where a 16M-row one is not) and voxelize —
     the accept decision is now made with the very values the decode
     pipeline uses, so the surviving rows are bit-identical to the
     march front-end's walk;
  6. a segmented-rank scan (b = exclusive prefix of accepts is
     non-decreasing, so cummax over run-start b values propagates each
     ray's base without a gather) + one bounded scatter produce the
     same packed emit table the march hands to
     ops/select.rank_gather_pack: value (qslot + 1) << 9 | d.

Exact-with-counters: `counters` reports voxels whose footprint
exceeded every class (class_overflow), per-class list truncation
(list_overflow), sorted-prefix truncation (live_overflow) and
`certain_flip` — prefix rows the band phase called certainly-inside
that the exact verify rejected, i.e. evidence the band is narrower
than the true recomputation error (never observed; the band is ~20x
the FMA-noise bound). All zero => the emit table is bit-identical to
the march front-end's (tests/test_raster.py).

Reference counterpart: the CUDA query pipeline builds per-sample
neighborhoods by walking rays (query_worldcoords.cu:165-302); this is
the scatter/bin dual of that gather design, shaped for the TPU's
cheap global sorts instead of per-thread atomics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT_MAX = np.int32(0x7FFFFFFF)

# footprint classes: (PX, PY, ND) budget dims. The first class has an
# unbounded voxel-list budget (all of max_q); later classes get static
# list budgets passed by the caller. Chosen from measured chair-800p
# footprint stats (tools/probe_raster.py --stats).
DEFAULT_CLASSES = ((3, 3, 3), (5, 5, 4), (8, 8, 6))


def _intrin4(focal, height: int, width: int):
    """(fx, fy, cx, cy) from either a scalar focal (principal point at
    the image center — the bench/synthetic camera) or a 4-tuple (the
    dataset loaders' arbitrary pinhole intrinsics)."""
    if isinstance(focal, (tuple, list)):
        fx, fy, cx, cy = (float(v) for v in focal)
    else:
        fx = fy = float(focal)
        cx, cy = width / 2.0, height / 2.0
    return fx, fy, cx, cy


def camera_rays_device(camrotc2w, height: int, width: int,
                       focal) -> jnp.ndarray:
    """f32 on-device twin of data.synthetic.camera_rays /
    data.blender.pixel_raydirs (OpenCV pinhole, +z forward).

    The raster band-verify recomputes ray directions per emitted
    sample with `_pixel_dirs` (gathering them would be row-issue-bound
    at ~16M rows); frame rays only need to AGREE with that formula to
    within the tolerance band, which this function, the numpy
    camera_rays AND pixel_raydirs (whose normalization adds +1e-5 to
    the norm — a ~1e-5 relative direction shift) all satisfy — the
    exact verify on the sorted prefix uses the caller's true ray array
    either way.
    """
    j, i = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                        jnp.arange(width, dtype=jnp.float32),
                        indexing="ij")
    return _pixel_dirs(i.reshape(-1), j.reshape(-1),
                       jnp.asarray(camrotc2w, jnp.float32),
                       height, width, focal)


def _pixel_dirs(i, j, camrotc2w, height: int, width: int, focal):
    """Shared pixel -> world ray-direction formula (f32; approximate
    agreement with the caller's ray array suffices — see BAND)."""
    fx, fy, cx, cy = _intrin4(focal, height, width)
    x = (i + np.float32(0.5 - cx)) * np.float32(1.0 / fx)
    y = (j + np.float32(0.5 - cy)) * np.float32(1.0 / fy)
    inv_n = jax.lax.rsqrt(x * x + y * y + np.float32(1.0))
    xn = x * inv_n
    yn = y * inv_n
    zn = inv_n
    r = camrotc2w
    return jnp.stack(
        [xn * r[0, 0] + yn * r[0, 1] + zn * r[0, 2],
         xn * r[1, 0] + yn * r[1, 1] + zn * r[1, 2],
         xn * r[2, 0] + yn * r[2, 1] + zn * r[2, 2]], axis=-1)


@functools.partial(jax.jit, static_argnames=("max_q",))
def build_qvox(coor_2_qslot: jnp.ndarray, max_q: int) -> jnp.ndarray:
    """Invert the dense voxel->qslot table: qvox[qslot] = (ix, iy, iz).

    One-time per scene build (scatter over the dense grid's rows).
    Unused qslots (>= n_q) keep (-1, -1, -1) and never emit.
    """
    dims = coor_2_qslot.shape
    if max(dims) > 1024:
        raise ValueError(
            f"raster voxel-coord packing needs grid dims <= 1024 "
            f"(got {dims}); huge-extent scenes use the hash front-end "
            f"which the raster does not serve")
    qs = coor_2_qslot.reshape(-1)
    gi = jnp.arange(qs.shape[0], dtype=jnp.int32)
    ix = gi // (dims[1] * dims[2])
    iy = (gi // dims[2]) % dims[1]
    iz = gi % dims[2]
    coords = jnp.stack([ix, iy, iz], -1)
    tgt = jnp.where(qs[:, None] >= 0, qs[:, None], max_q)
    return jnp.full((max_q, 3), -1, jnp.int32).at[
        tgt[:, 0]].set(coords, mode="drop")


def _voxel_footprint(qvox, ranges_min, scaled_vsize, campos, camrotc2w,
                     height, width, focal, near, far, D, step_t):
    """Per-voxel conservative screen bbox + depth-bin range.

    Returns (i0, j0, d0, w, h, nd, ok) — int32 [max_q] each. `ok`
    False for empty qslots and voxels fully outside frame/depth range
    (their footprint is provably ray-free); voxels too close to the
    camera plane get w = h = INT_MAX so they land in class_overflow.
    """
    valid = qvox[:, 0] >= 0
    lo = ranges_min + qvox.astype(jnp.float32) * scaled_vsize
    hi = lo + scaled_vsize
    # 8 corners [max_q, 8, 3]
    sel = jnp.array([[(c >> a) & 1 for a in range(3)]
                     for c in range(8)], jnp.float32)
    corners = lo[:, None, :] * (1 - sel) + hi[:, None, :] * sel
    rel = corners - campos                                # world
    # x_cam = R^T rel — spelled elementwise: an einsum here lowers to
    # the MXU whose default f32 path truncates inputs to bf16 (chip
    # r5b: corners off by 1-3 voxels => 8% of samples never emitted
    # and footprints twice their true size; the VPU form is exact f32)
    r = camrotc2w
    cam = jnp.stack(
        [rel[..., 0] * r[0, k] + rel[..., 1] * r[1, k]
         + rel[..., 2] * r[2, k] for k in range(3)], axis=-1)
    z = cam[..., 2]
    zmin = jnp.min(z, -1)
    behind = zmin < np.float32(1e-3)
    fx, fy, cx, cy = _intrin4(focal, height, width)
    zs = jnp.maximum(z, np.float32(1e-3))
    u = np.float32(fx) * cam[..., 0] / zs + np.float32(cx - 0.5)
    v = np.float32(fy) * cam[..., 1] / zs + np.float32(cy - 0.5)
    pad = np.float32(0.05)
    umin, umax = jnp.min(u, -1) - pad, jnp.max(u, -1) + pad
    vmin, vmax = jnp.min(v, -1) - pad, jnp.max(v, -1) + pad
    i0 = jnp.ceil(umin).astype(jnp.int32)
    i1 = jnp.floor(umax).astype(jnp.int32)
    j0 = jnp.ceil(vmin).astype(jnp.int32)
    j1 = jnp.floor(vmax).astype(jnp.int32)
    # clip to the frame (a bbox partly outside keeps its inside part)
    i0c = jnp.maximum(i0, 0)
    j0c = jnp.maximum(j0, 0)
    w = jnp.minimum(i1, width - 1) - i0c + 1
    h = jnp.minimum(j1, height - 1) - j0c + 1
    # depth range along normalized rays: euclidean distance extrema
    # over the AABB (min at the box's closest point, max at a corner)
    nearest = jnp.clip(campos, lo, hi)
    tmin = jnp.linalg.norm(nearest - campos, axis=-1)
    tmax = jnp.sqrt(jnp.max(jnp.sum(rel * rel, -1), -1))
    tpad = np.float32(2e-3)
    d0f = jnp.ceil((tmin - tpad - near) / step_t - np.float32(0.5))
    d1f = jnp.floor((tmax + tpad - near) / step_t - np.float32(0.5))
    d0 = jnp.maximum(d0f.astype(jnp.int32), 0)
    d1 = jnp.minimum(d1f.astype(jnp.int32), D - 1)
    nd = d1 - d0 + 1
    ok = valid & (w > 0) & (h > 0) & (nd > 0) & ~behind
    # behind-camera voxels can still be ray-hit: force them into
    # class_overflow rather than silently dropping
    w = jnp.where(behind & valid, INT_MAX, w)
    h = jnp.where(behind & valid, INT_MAX, h)
    ok = ok | (behind & valid)
    return i0c, j0c, d0, w, h, nd, ok


def raster_emit_table(
    qvox: jnp.ndarray,            # [max_q, 3] int32 (build_qvox)
    ranges_min: jnp.ndarray,      # [3] f32
    scaled_vsize: jnp.ndarray,    # [3] f32
    campos: jnp.ndarray,          # [3] f32
    camrotc2w: jnp.ndarray,       # [3, 3] f32
    raydirs_frame: jnp.ndarray,   # [H*W, 3] f32 (camera_rays_device)
    height: int, width: int, focal: float,
    near, far, D: int, step_t,
    cap: int,                     # per-ray emit cap = min(SR, BP, D)
    classes: Tuple[Tuple[int, int, int], ...] = DEFAULT_CLASSES,
    class_budgets: Tuple[int, ...] = (0, 65536, 8192),
    live_budget: int = 4_194_304,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-level packed emit table [H*W, cap] (march-compatible).

    Returns (emit, counters[4] int32):
      counters = [class_overflow, list_overflow, live_overflow,
                  rd_mismatch]; all zero => `emit` is bit-identical to
      the march front-end's per-ray first-cap ascending-d emit.
    A class budget of 0 means max_q (no truncation possible).
    """
    max_q = qvox.shape[0]
    near = jnp.asarray(near, jnp.float32)
    step_t = jnp.asarray(step_t, jnp.float32)
    HW = height * width
    if D > 512:
        raise ValueError("raster key packing needs z_depth_dim <= 512 "
                         "(same bound as the march's packed emit)")
    if HW > (1 << 22):
        raise ValueError("raster key packing needs <= 2^22 pixels "
                         f"per frame (got {HW})")

    i0, j0, d0, w, h, nd, ok = _voxel_footprint(
        qvox, ranges_min, scaled_vsize, campos, camrotc2w,
        height, width, focal, near, far, D, step_t)

    # class = smallest class whose dims cover (w, h, nd); n_cls = none
    n_cls = len(classes)
    cls = jnp.full((max_q,), n_cls, jnp.int32)
    for c in range(n_cls - 1, -1, -1):
        px, py, ndc = classes[c]
        fits = (w <= px) & (h <= py) & (nd <= ndc)
        cls = jnp.where(fits, c, cls)
    cls = jnp.where(ok, cls, n_cls + 1)      # ray-free voxels: emit no rows
    class_overflow = jnp.sum((cls == n_cls).astype(jnp.int32))

    # class-sorted voxel ids: classes become contiguous runs. Padded
    # by the largest class budget so the per-class dynamic_slice can
    # never clamp its start: a clamped slice silently re-enumerates
    # the previous class's voxels (duplicate emissions) and drops the
    # real tail (chip r5b: 27k rays with duplicated rows when class-2's
    # window ran past max_q). Padding rows are masked by row_ok.
    order_key = cls * jnp.int32(max_q + 1) + jnp.arange(max_q, dtype=jnp.int32)
    _, ids_sorted = jax.lax.sort_key_val(
        order_key, jnp.arange(max_q, dtype=jnp.int32))
    pad_n = max(min(int(b) or max_q, max_q) for b in class_budgets)
    ids_sorted = jnp.concatenate(
        [ids_sorted, jnp.zeros((pad_n,), jnp.int32)])
    counts = jnp.stack([jnp.sum((cls == c).astype(jnp.int32))
                        for c in range(n_cls)])
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    # tolerance band (in voxel units) for the phase-1 accept: must
    # dominate |inline-recomputed pos - true pos| / vsize. FMA/ulp
    # noise between two compilations of the ray formula is ~1e-7
    # relative (~5e-5 voxels at chair geometry); the dataset loaders'
    # pixel_raydirs additionally normalizes with a +1e-5 norm guard —
    # a ~1e-5 relative direction shift => ~7.5e-3 voxels. 3e-2 gives
    # 4x margin over that while admitting only a ~2% row surplus.
    BAND = np.float32(3e-2)

    key_parts, val_parts, vc_parts = [], [], []
    list_overflow = jnp.zeros((), jnp.int32)
    for c, (px, py, ndc) in enumerate(classes):
        n_c = min(int(class_budgets[c]) or max_q, max_q)
        e_c = px * py * ndc
        ids_c = jax.lax.dynamic_slice_in_dim(ids_sorted, starts[c], n_c)
        row_ok = jnp.arange(n_c, dtype=jnp.int32) < counts[c]
        list_overflow = list_overflow + jnp.maximum(counts[c] - n_c, 0)
        # per-voxel data (one [n_c]-row gather each — cheap)
        vi0 = i0[ids_c]
        vj0 = j0[ids_c]
        vd0 = d0[ids_c]
        vw = w[ids_c]
        vh = h[ids_c]
        vnd = nd[ids_c]
        vq = qvox[ids_c]                                        # [n_c,3]
        # offset enumeration (broadcast against [1, e_c] — no gathers)
        off = jnp.arange(e_c, dtype=jnp.int32)[None, :]
        oa = off // (py * ndc)
        ob = (off // ndc) % py
        oc = off % ndc
        ii = vi0[:, None] + oa
        jj = vj0[:, None] + ob
        dd = vd0[:, None] + oc
        live = (row_ok[:, None] & (oa < vw[:, None]) & (ob < vh[:, None])
                & (oc < vnd[:, None]) & (ii < width) & (jj < height))
        # band verify: sample position (inline-recomputed rays) must
        # land inside the voxel expanded by BAND
        rd = _pixel_dirs(ii.astype(jnp.float32).reshape(-1),
                         jj.astype(jnp.float32).reshape(-1),
                         camrotc2w, height, width, focal)
        t = near + (dd.astype(jnp.float32).reshape(-1)
                    + np.float32(0.5)) * step_t
        pos = campos + rd * t[:, None]
        f = (pos - ranges_min) / scaled_vsize
        vq_b = jnp.broadcast_to(
            vq.astype(jnp.float32)[:, None, :],
            (n_c, e_c, 3)).reshape(-1, 3)
        near_in = jnp.all((f > vq_b - BAND) & (f < vq_b + 1 + BAND), -1)
        live = live.reshape(-1) & near_in
        ray = (jj * width + ii).reshape(-1)
        key = jnp.where(live, (ray << 9) | dd.reshape(-1), INT_MAX)
        val = jnp.broadcast_to(ids_c[:, None], (n_c, e_c)).reshape(-1)
        # certainly-inside flag: > BAND from every face — the exact
        # verify must agree on these rows (counter `certain_flip`)
        certain = jnp.all((f > vq_b + BAND) & (f < vq_b + 1 - BAND), -1)
        vcoord = ((vq[:, 0] << 21) | (vq[:, 1] << 11)
                  | (vq[:, 2] << 1))[:, None]                   # [n_c,1]
        vc = (jnp.broadcast_to(vcoord, (n_c, e_c)).reshape(-1)
              | certain.astype(jnp.int32))
        key_parts.append(key)
        val_parts.append(val)
        vc_parts.append(vc)

    keys = jnp.concatenate(key_parts)
    vals = jnp.concatenate(val_parts)
    vcs = jnp.concatenate(vc_parts)
    n_valid = jnp.sum((keys != INT_MAX).astype(jnp.int32))
    live_overflow = jnp.maximum(n_valid - live_budget, 0)

    keys_s, vals_s, vcs_s = jax.lax.sort(
        (keys, vals, vcs), num_keys=1)
    S = min(live_budget, int(keys.shape[0]))
    keys_p = jax.lax.slice_in_dim(keys_s, 0, S)
    vals_p = jax.lax.slice_in_dim(vals_s, 0, S)
    vcs_p = jax.lax.slice_in_dim(vcs_s, 0, S)

    ray_p = keys_p >> 9
    d_p = keys_p & 511
    in_prefix = keys_p != INT_MAX
    # exact verify on the bounded prefix, with the TRUE ray directions
    rd_true = raydirs_frame[jnp.where(in_prefix, ray_p, 0)]
    t_p = near + (d_p.astype(jnp.float32) + np.float32(0.5)) * step_t
    pos_p = campos + rd_true * t_p[:, None]
    gcf = jnp.floor((pos_p - ranges_min) / scaled_vsize)
    vq_p = jnp.stack([(vcs_p >> 21) & 1023, (vcs_p >> 11) & 1023,
                      (vcs_p >> 1) & 1023], -1).astype(jnp.float32)
    accept = in_prefix & jnp.all(gcf == vq_p, -1)
    certain_flip = jnp.sum(
        ((vcs_p & 1) == 1).astype(jnp.int32)
        * (in_prefix & ~accept).astype(jnp.int32))

    # segmented rank over accepted rows: b (exclusive accept prefix)
    # is non-decreasing, so cummax over run-start b values propagates
    # each ray-run's base without a gather
    a = accept.astype(jnp.int32)
    b = jnp.cumsum(a) - a
    start = jnp.concatenate(
        [jnp.ones((1,), bool), ray_p[1:] != ray_p[:-1]])
    base = jax.lax.cummax(jnp.where(start, b, 0))
    rank = b - base
    packed = ((vals_p + 1) << 9) | d_p
    dest = jnp.where(accept & (rank < cap), ray_p * cap + rank,
                     jnp.int32(HW * cap))
    # NOTE: no unique_indices — accepted destinations ARE unique, but
    # every dropped row shares the single out-of-range sentinel, and
    # the TPU scatter lowering exploits the uniqueness promise before
    # bounds handling (chip run r5b: 49k corrupted output elements
    # with the hint; bit-exact without it — CPU never showed it)
    emit = jnp.zeros((HW * cap,), jnp.int32).at[dest].set(
        packed, mode="drop")

    counters = jnp.stack([class_overflow, list_overflow,
                          live_overflow, certain_flip])
    return emit.reshape(HW, cap), counters


def make_raster_program(height: int, width: int, focal: float,
                        D: int, cap: int,
                        classes=DEFAULT_CLASSES,
                        class_budgets=(0, 65536, 8192),
                        live_budget: int = 4_194_304):
    """Jitted frame front-end with the static geometry baked in.

    Returns fn(qvox, ranges_min, scaled_vsize, campos, camrotc2w,
    raydirs_frame, near, step_t, salt) -> (emit [H*W, cap], counters).
    `salt` perturbs nothing (multiplied by zero) but makes each
    invocation's argument content distinct — the axon backend memoizes
    results on (program, argument content), so a benchmark that timed
    a second identical build would read a phantom ~0 ms (STATUS.md
    measurement rule 2).
    """
    def fn(qvox, ranges_min, scaled_vsize, campos, camrotc2w,
           raydirs_frame, near, step_t, salt):
        campos = campos + salt * np.float32(0.0)
        return raster_emit_table(
            qvox, ranges_min, scaled_vsize, campos, camrotc2w,
            raydirs_frame, height, width, focal, near, None, D,
            step_t, cap, classes=classes, class_budgets=class_budgets,
            live_budget=live_budget)

    return jax.jit(fn)

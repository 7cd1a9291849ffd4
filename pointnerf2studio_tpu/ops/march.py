"""Distance-field ray marching front-end for the fast render path.

The fast path's largest front-end cost is the per-sample qslot table
gather: [R, D] (or [RB, DW] with the depth-window/ray-budget reducers)
rows at ~7 ns/row, testing EVERY depth sample against the query-voxel
table even though only ~3-5% of in-box samples land in a query voxel
at chair geometry (the reference instead walks rays inside its CUDA
kernels, query_worldcoords.cu:165-214). This module cuts the tested
rows to roughly the number of STEPS a sphere-trace takes:

  * build time: a Chebyshev distance field over the query-voxel grid
    (iterated 3x3x3 max-pool dilation), packed with the qslot table
    into ONE int32 per voxel: (qslot + 1) << 5 | min(dist, 31).
  * render time: each ray marches its in-box span. At an occupied
    voxel it emits the sample into its per-ray slot list and steps to
    the next sample; at an empty voxel the packed distance d gives a
    safety radius — every sample within (d-1) * min_voxel_edge world
    units is provably empty (strictly: a point in a voxel at Chebyshev
    distance >= d is more than (d-1) * edge away along some axis), so
    the ray skips floor((d-1) * edge / step_len) samples at once.
  * the march runs in STAGES over shrinking static ray sets: most rays
    finish in a few steps (box misses take ~span/skip steps), so after
    steps[0] iterations the still-active rays are packed into a
    march_buckets[0]-sized buffer (lax.top_k by ray id, the same
    static-prefix packing as QueryConfig.ray_budget) and marched for
    steps[1] more, and so on. Gather rows ~= total steps taken instead
    of R * max_steps.

Exact-with-counter (the dw/rb pattern): the emitted samples equal the
dense path's first-cap valid samples per ray BY CONSTRUCTION while
every ray finishes within the staged fuel/buckets; rays still active
after the last stage are counted in mc_overflow (nonzero = raise
march_steps / march_buckets, results possibly missing samples).

Reference semantics anchor: the emitted (ray, depth, qslot) set equals
`select_first_cols` over the dense qs table (fast_render.py) — i.e.
the first min(SR, ray_slot_budget) occupied samples per ray in depth
order, the TPU form of get_shadingloc (query_worldcoords.cu:192-214).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_march_table(coor_2_qslot: jnp.ndarray, cmax: int = 31) -> jnp.ndarray:
    """Pack the qslot table with a Chebyshev distance field.

    Returns int32 [gx, gy, gz]: (qslot + 1) << 5 | min(c, 31) where c
    is the L-inf distance (in voxels) to the nearest query voxel
    (c == 0 iff the voxel itself is a query voxel). Empty voxels have
    qslot bits 0. cmax caps the field (bigger = larger skips through
    empty space; 31 fills the 5 packed bits).
    """
    occ = (coor_2_qslot >= 0).astype(jnp.int32)
    dil = occ
    c = jnp.zeros(occ.shape, jnp.int32)
    for _ in range(min(cmax, 31)):
        c = c + (1 - dil)
        dil = jax.lax.reduce_window(
            dil, 0, jax.lax.max, window_dimensions=(3, 3, 3),
            window_strides=(1, 1, 1), padding=((1, 1),) * 3)
    return ((coor_2_qslot + 1) << 5) | jnp.minimum(c, 31)


def march_rays(
    table_flat: jnp.ndarray,        # [gx*gy*gz] packed int32
    dims_arr: jnp.ndarray,          # [3] int32 grid dims
    gy: int, gz: int,
    ranges_min: jnp.ndarray,        # [3]
    scaled_vsize: jnp.ndarray,      # [3]
    campos: jnp.ndarray,            # [3]
    raydirs: jnp.ndarray,           # [R, 3]
    near, far, step_t,              # scalars (device ok)
    D: int,
    cap: int,                       # per-ray slot cap (min(SR, BP, D))
    steps: Tuple[int, ...],
    buckets: Tuple[int, ...],       # static packed sizes, stages 1..
    t_tab: Optional[jnp.ndarray] = None,   # [R, D] actual per-sample
                                    # ts (jittered raygen mid_ts);
                                    # None -> the affine unjittered t
    jitter: float = 0.0,            # raygen jitter fraction (sizes the
                                    # skip-safety margin under t_tab)
    live: Optional[jnp.ndarray] = None,    # [R] bool: rows that carry
                                    # real rays. Ray-budget packing
                                    # pads its array with DUPLICATES
                                    # of row 0; without this mask the
                                    # dup rows march like real rays,
                                    # occupy bucket slots and fuel the
                                    # planner never accounted for, and
                                    # trip mc_overflow (the r4 bench's
                                    # chunk-dependent 276-788 trips)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """March every ray's in-box span through the packed table.

    Returns (emit [R, cap] int32 — (qslot + 1) << 9 | depth, 0 in
    unused slots; cnt [R] int32 — emitted samples per ray;
    mc_overflow [] int32 — rays whose span was not fully tested).
    Requires qslot < 2**22 and D <= 512 (packing; callers gate).

    With `t_tab` (the TRAIN path's jittered sample times) each tested
    sample's t comes from one extra [active]-row gather, so emission
    tests the TRUE jittered positions; the empty-space skip stays safe
    because stratified mids are monotonic with per-sample spacing at
    most step_t * (1 + jitter/2) (consecutive-segment mean of raygen's
    seg = base * (1 + jitter*(u-0.5))), so dividing the free radius by
    that bound never skips past a sample that could sit inside it.
    Termination also reads the true t (t > t_exit ends the convex-box
    chord exactly); entry starts from the conservative earliest index
    whose mid could reach t_enter.
    """
    R = raydirs.shape[0]
    assert len(buckets) == max(len(steps) - 1, 0), (
        "march_buckets must have one entry per stage after the first")
    dims_f = dims_arr.astype(jnp.float32)
    s_min = jnp.min(scaled_vsize)
    jfac = 1.0 + 0.5 * float(jitter)

    # slab test — the same float math as the depth-window branch of
    # fast_render_rays, so in-box span coverage is identical
    rmax = ranges_min + dims_f * scaled_vsize
    safe = jnp.where(jnp.abs(raydirs) < 1e-9,
                     jnp.where(raydirs >= 0, 1e-9, -1e-9), raydirs)
    inv = 1.0 / safe
    ta = (ranges_min - campos) * inv
    tb = (rmax - campos) * inv
    t_enter = jnp.max(jnp.minimum(ta, tb), -1)
    t_exit = jnp.min(jnp.maximum(ta, tb), -1)
    if t_tab is None:
        d_lo = jnp.floor((t_enter - near) / step_t
                         - 0.5).astype(jnp.int32)
        d_hi = jnp.minimum(
            jnp.ceil((jnp.minimum(t_exit, far) - near) / step_t
                     - 0.5).astype(jnp.int32), D - 1)
    else:
        # conservative index bounds under jittered mids: mid[d] lies in
        # near + (d + 0.5) * step_t * [1 -/+ jitter/2]; jittered
        # segment cumsums can overshoot `far` by jitter/2 * (far-near)
        # and such samples are still tested by the dense path when
        # they sit inside the box — the far margin must cover them
        far_ov = far + 0.5 * float(jitter) * (far - near)
        d_lo = jnp.floor((t_enter - near) / (step_t * jfac)
                         - 0.5).astype(jnp.int32)
        d_hi = jnp.minimum(
            jnp.ceil((jnp.minimum(t_exit, far_ov) + step_t - near)
                     / (step_t * max(1.0 - 0.5 * float(jitter), 1e-3))
                     - 0.5).astype(jnp.int32), D - 1)
        t_flat = t_tab.reshape(-1)
    hit_box = (t_exit >= t_enter) & (d_hi >= 0)
    t_stop = (jnp.minimum(t_exit, far if t_tab is None else far_ov)
              + step_t)                             # true-t termination

    d = jnp.clip(d_lo, 0, D - 1)
    dhi_full = d_hi
    stepw = step_t * jnp.linalg.norm(raydirs, axis=-1)      # [R]
    done = (~hit_box) | (d > d_hi)
    if live is not None:
        done = done | ~live
    k = jnp.zeros((R,), jnp.int32)
    emit = jnp.zeros((R, cap), jnp.int32)
    slot_iota = jnp.arange(cap, dtype=jnp.int32)
    iota = jnp.arange(R, dtype=jnp.int32)

    def run_stage(T, rd, sw, dhi, oid, tstop, state):
        def body(_, st):
            d, k, done, emit = st
            if t_tab is None:
                t = near + (d.astype(jnp.float32) + 0.5) * step_t
            else:
                t = t_flat[jnp.minimum(oid * D + d, R * D - 1)]
            pos = campos + rd * t[:, None]
            gc = jnp.floor((pos - ranges_min) / scaled_vsize
                           ).astype(jnp.int32)
            inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
            gcc = jnp.clip(gc, 0, dims_arr - 1)
            fi = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
            qsd = jnp.where(inb, table_flat[jnp.where(inb, fi, 0)], 0)
            qs1 = qsd >> 5
            occ = qs1 > 0
            active = ~done
            emitn = occ & active
            packed = (qs1 << 9) | jnp.minimum(d, 511)
            emit = jnp.where(
                emitn[:, None] & (slot_iota == k[:, None]),
                packed[:, None], emit)
            k = k + emitn.astype(jnp.int32)
            # safety skip: a voxel at Chebyshev distance c has every
            # point strictly farther than (c-1)*s_min along the ray;
            # under jittered mids the per-sample advance is bounded by
            # sw * jfac. The skip count is the largest k with
            # k * bound < radius — computed as a division SEED plus a
            # multiply-only fixup, because TPU f32 division is
            # reciprocal-based and its floor systematically reads one
            # lower than the host planner's IEEE divide (measured:
            # ~35% more device steps than the host sim predicted,
            # tripping planned fuel/buckets; XLA-CPU matched the host
            # exactly). Correctly-rounded multiplies make the fixup
            # agree bit-for-bit with the planner.
            cfree = jnp.where(inb, qsd & 31, 1)
            A = (cfree - 1).astype(jnp.float32) * s_min
            B = sw * jfac
            q1 = jnp.floor(A / B - 1e-4).astype(jnp.int32)
            for _ in range(2):      # seed is within +-2 of the target
                q1 = q1 + ((q1 + 1).astype(jnp.float32) * B < A
                           ).astype(jnp.int32)
            for _ in range(2):
                q1 = q1 - (q1.astype(jnp.float32) * B >= A
                           ).astype(jnp.int32)
            skip = jnp.where(occ | (cfree <= 1), 1, jnp.maximum(1, q1))
            d = d + jnp.where(active, skip, 0)
            done = done | (d > dhi) | (k >= cap)
            if t_tab is not None:
                done = done | (t > tstop)
            return d, k, done, emit
        return jax.lax.fori_loop(0, T, body, state)

    d, k, done, emit = run_stage(
        steps[0], raydirs, stepw, dhi_full, iota, t_stop,
        (d, k, done, emit))

    for T, RS in zip(steps[1:], buckets):
        RS = min(RS, R)
        top = jax.lax.top_k(jnp.where(~done, -iota, -(R + 1)), RS)[0]
        valid = top >= -R
        ids = jnp.where(valid, -top, R)         # R = drop sentinel
        idc = jnp.minimum(ids, R - 1)
        st = (d[idc], k[idc], done[idc] | ~valid, emit[idc])
        d_s, k_s, done_s, emit_s = run_stage(
            T, raydirs[idc], stepw[idc], dhi_full[idc], idc,
            t_stop[idc], st)
        d = d.at[ids].set(d_s, mode="drop")
        k = k.at[ids].set(k_s, mode="drop")
        done = done.at[ids].set(done_s, mode="drop")
        emit = emit.at[ids].set(emit_s, mode="drop")

    mc_overflow = jnp.sum((~done).astype(jnp.int32))
    return emit, jnp.minimum(k, cap), mc_overflow


def simulate_march(
    table: np.ndarray,              # [gx, gy, gz] packed (host)
    ranges_min, scaled_vsize, campos,
    rays: np.ndarray,               # [R, 3]
    near: float, far: float, D: int, cap: int,
    jitter: float = 0.0,
) -> np.ndarray:
    """Host simulation of march_rays with unbounded fuel.

    Returns steps_used [R] int64 — the number of march iterations each
    ray takes to finish (0 for rays that never start: box misses and
    empty spans). The same float32 math as the device kernel, so the
    device counts match up to float drift at voxel boundaries.

    `jitter` > 0 models the TRAIN path's jittered device walk (the
    t_tab branch of march_rays): the skip free-radius divides by
    jfac = 1 + jitter/2 and the d_lo/d_hi index bounds widen the same
    way the device's conservative bounds do — conservative in the
    bound/skip terms, though not a strict per-ray guarantee (the
    device walks the true jittered positions through potentially
    different voxels than the unjittered sim); the residual divergence
    is absorbed by the callers' fuel margins and verified on device by
    the mc_overflow counter. Without the jitter model, march_auto
    train plans systematically UNDERESTIMATE device steps and lean on
    ad-hoc caller margins (ADVICE r3).

    `campos` may be [3] (one camera) or [R, 3] per-ray origins — the
    latter lets plan_march size budgets over rays drawn from SEVERAL
    training cameras at once (the device kernel always runs one camera
    per step, so per-ray origins are a planning-only concept)."""
    dims = np.asarray(table.shape, np.int64)
    gy, gz = int(dims[1]), int(dims[2])
    tflat = np.asarray(table).reshape(-1)
    rmin = np.asarray(ranges_min, np.float32)
    svs = np.asarray(scaled_vsize, np.float32)
    campos = np.asarray(campos, np.float32)
    rays = np.asarray(rays, np.float32)
    step_t = np.float32((far - near) / D)
    s_min = np.float32(svs.min())

    safe = np.where(np.abs(rays) < 1e-9,
                    np.where(rays >= 0, 1e-9, -1e-9), rays)
    inv = np.float32(1.0) / safe
    ta = (rmin - campos) * inv
    tb = (rmin + dims.astype(np.float32) * svs - campos) * inv
    t_enter = np.minimum(ta, tb).max(-1)
    t_exit = np.maximum(ta, tb).min(-1)
    jfac = np.float32(1.0 + 0.5 * float(jitter))
    if jitter <= 0.0:
        d_lo = np.floor((t_enter - near) / step_t - 0.5).astype(np.int64)
        d_hi = np.minimum(
            np.ceil((np.minimum(t_exit, far) - near) / step_t
                    - 0.5).astype(np.int64), D - 1)
    else:
        # the device t_tab branch's conservative jittered bounds
        # (march_rays d_lo/d_hi): earlier entry, later exit
        far_ov = np.float32(far + 0.5 * float(jitter) * (far - near))
        d_lo = np.floor((t_enter - near) / (step_t * jfac)
                        - 0.5).astype(np.int64)
        d_hi = np.minimum(
            np.ceil((np.minimum(t_exit, far_ov) + step_t - near)
                    / (step_t
                       * np.float32(max(1.0 - 0.5 * float(jitter), 1e-3)))
                    - 0.5).astype(np.int64), D - 1)
    hit = (t_exit >= t_enter) & (d_hi >= 0)

    d = np.clip(d_lo, 0, D - 1)
    stepw = step_t * np.linalg.norm(rays, axis=-1).astype(np.float32)
    done = (~hit) | (d > d_hi)
    k = np.zeros(rays.shape[0], np.int64)
    steps_used = np.zeros(rays.shape[0], np.int64)
    for _ in range(2 * D + 8):
        if done.all():
            break
        act = ~done
        t = (near + (d.astype(np.float32) + 0.5) * step_t)[act]
        pos = ((campos if campos.ndim == 1 else campos[act])
               + rays[act] * t[:, None])
        gc = np.floor((pos - rmin) / svs).astype(np.int64)
        inb = ((gc >= 0) & (gc < dims)).all(-1)
        gcc = np.clip(gc, 0, dims - 1)
        fi = (gcc[:, 0] * gy + gcc[:, 1]) * gz + gcc[:, 2]
        qsd = np.where(inb, tflat[fi], 0)
        occ = (qsd >> 5) > 0
        kk = k[act] + occ
        cfree = np.where(inb, qsd & 31, 1)
        # multiply-fixup floor, bit-matching the device kernel (whose
        # reciprocal-based f32 division needs the same fixup)
        A = (cfree - 1).astype(np.float32) * s_min
        B = stepw[act] * jfac
        q1 = np.floor(A / B - 1e-4).astype(np.int64)
        for _ in range(2):
            q1 = q1 + ((q1 + 1).astype(np.float32) * B < A)
        for _ in range(2):
            q1 = q1 - (q1.astype(np.float32) * B >= A)
        skip = np.where(occ | (cfree <= 1), 1, np.maximum(1, q1))
        dd = d[act] + skip
        k[act] = kk
        d[act] = dd
        steps_used[act] += 1
        done[act] = (dd > d_hi[act]) | (kk >= cap)

    return steps_used


def plan_march(
    table: np.ndarray,              # [gx, gy, gz] packed (host)
    ranges_min, scaled_vsize, campos,
    rays: np.ndarray,               # [R, 3] representative ray set
    near: float, far: float, D: int, cap: int,
    stages: int = 4, slack: float = 1.10,
    chunk: int = 0, fuel_margin: int = 4,
    jitter: float = 0.0,
    block_lens: Optional[Tuple[int, ...]] = None,
) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Size (march_steps, march_buckets) from a host simulation.

    Simulates the march on `rays` with unbounded fuel (simulate_march,
    with `jitter` modeling the train path's jittered walk), records
    each ray's steps-to-done, and cuts stages at quantiles: stage fuel
    boundaries at ~p50/p80/p95/max(+fuel_margin), bucket sizes at the
    simulated active counts x `slack` (+256, rounded to 256). Margins
    absorb host/device float drift; mc_overflow still verifies
    exactness on device.

    `chunk` > 0: the rays will be rendered in `chunk`-sized chunks (in
    THIS order) — buckets are sized at the MAX over chunks of each
    chunk's own active count at the stage boundary, not a rescale of
    the frame total (the r2 round-end bench under-provisioned chunk 1
    by exactly that rescale and fell back off the march path). A tail
    partial chunk is zero-padded into the per-chunk max, not dropped.

    `block_lens` overrides the uniform chunking: the rays are grouped
    into consecutive blocks of these exact lengths (one block = one
    device dispatch — e.g. fit()'s per-view probe sets, which can be
    shorter than the nominal chunk on small images).
    """
    steps_used = simulate_march(table, ranges_min, scaled_vsize,
                                campos, rays, near, far, D, cap,
                                jitter=jitter)
    n_done = steps_used[steps_used > 0]
    if n_done.size == 0:
        return (8,), ()
    # stage boundaries at quantiles of steps-to-done: the shipped
    # 4-stage default keeps its verified cuts; more stages halve the
    # remaining active mass per extra cut (total gathered rows =
    # sum(stage_size * stage_len) approaches sum(steps_used) as the
    # staging gets finer — each re-pack costs one top_k + state copy)
    if stages <= 4:
        qs = [0.5, 0.8, 0.95][: max(stages - 1, 0)]
    else:
        qs = [1.0 - 0.5 ** i for i in range(1, stages)]
    cuts = sorted(set(
        int(np.quantile(n_done, p)) + 1 for p in qs))
    cuts = [c for c in cuts if c < int(n_done.max())]
    bounds = cuts + [int(n_done.max()) + fuel_margin]
    R = rays.shape[0]
    if block_lens is not None:
        assert sum(block_lens) == R, (block_lens, R)
        max_l = max(block_lens)
        rows, off = [], 0
        for bl in block_lens:
            rows.append(np.pad(steps_used[off:off + bl],
                               (0, max_l - bl)))
            off += bl
        su_c = np.stack(rows)
        cap_rays = max_l
    elif chunk:
        cap_rays = min(chunk, R)
        n_chunks = (R + chunk - 1) // chunk
        su_c = np.pad(steps_used,
                      (0, n_chunks * chunk - R)).reshape(n_chunks, chunk)
    else:
        cap_rays = R
        su_c = steps_used[None, :]
    steps_plan, buckets, prev = [], [], 0
    for i, b in enumerate(bounds):
        steps_plan.append(b - prev)
        if i < len(bounds) - 1:
            active = int((su_c > b).sum(-1).max())
            buckets.append(min(
                cap_rays,
                (int(active * slack) + 256 + 255) // 256 * 256))
        prev = b
    return tuple(steps_plan), tuple(buckets)

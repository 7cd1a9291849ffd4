"""Micro-op timing of the chunk pipeline's inner operations at chair
bench scale (one variant per process — STATUS.md phantom-timing rules;
fetch-forced via tools/timing.py).

The r3e fused-chunk probe (186 ms vs 159 XLA) falsified the "bytes-
heavy intermediates" theory: the chunk cost is COMPUTE-spread — PE
transcendentals, batched-tiny extract matmuls, per-(slot, K) VPU
geometry. This probe times each candidate inner op standalone so the
next kernel design optimizes against measured per-slot costs instead
of a roofline guess.

Usage: python tools/probe_microops.py <variant>
Variants: extract_onehot | extract_tala | extract_rowgather | pe_feat
          | pe_dists | pe_feat_rec | pe_dists_rec | sin_raw
          | gemm_tower | geom | knn | weights | gather_fat | gather_slim
          | krows_bitcast | krows_flatgather | krows_full
Scale: M = 262144 slots (HALF a 65k-ray dispatch's 524288 — keeps the
4 distinct input buffers under HBM); results normalized per 524k.

r3g lesson: the extract_*/gather_fat variants originally CLOSED OVER
the [MAXQ, C, PAYW] table in the jitted fn — 738 MB of constants in
the remote-compile request body = HTTP 413 (STATUS.md rule 2). Tables
are now passed as runtime ARGUMENTS via a plain-Python wrapper.

The krows_* variants bisect the r3h TPU compiler crash
(tpu_compile_helper exit 1 on extract_mode="krows", both probe runs):
each isolates one suspect op at pipeline shapes; whichever variant
reproduces the HTTP 500 names the op to restructure.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.timing import timed_scalar_calls

M = 262_144          # half dispatch
FULL = 524_288
C = 64               # candidates per query voxel (cand_cap)
K = 8
PAYW = 44
EMB = 32
NFF, NDF, NVF = 3, 5, 4
HID = 256
MAXQ = 131_072       # qslot table rows (chair ~99k query voxels)
N_CALLS = 4

if os.environ.get("PROBE_SMOKE"):
    M, MAXQ = 4096, 2048


def rngs(n, shape, dtype=jnp.float32, lo=0, hi=None, seed=0):
    out = []
    for i in range(n):
        r = np.random.default_rng(seed + i)
        if hi is not None:
            out.append(jnp.asarray(
                r.integers(lo, hi, size=shape, dtype=np.int32)))
        else:
            out.append(jnp.asarray(
                r.standard_normal(shape).astype(np.float32)).astype(dtype))
    return out


def main():
    which = sys.argv[1]
    report_scale = FULL / M
    if not os.environ.get("PROBE_SMOKE"):
        from tools.timing import congestion_sentinel
        print(f"sentinel {congestion_sentinel():.2f} ms", flush=True)

    if which.startswith("extract") or which == "gather_fat":
        pay = jnp.asarray(
            np.random.default_rng(99).standard_normal(
                (MAXQ, C, PAYW)).astype(np.float32)).astype(jnp.bfloat16)

    if which == "extract_onehot":
        # the shipped extract: one-hot einsum built from top_idx
        idxs = rngs(N_CALLS + 1, (M, K), lo=0, hi=C, seed=1)
        qs = rngs(1, (M,), lo=0, hi=MAXQ, seed=50)[0]

        @jax.jit
        def jf(idx, p_tab, qs_a):
            p = p_tab[qs_a]                                 # [M, C, PAYW]
            oh = (idx[..., None] == jnp.arange(C)).astype(jnp.bfloat16)
            nsel = jnp.einsum("mkc,mca->mka", oh, p)
            return nsel.astype(jnp.float32).sum()

        def f(idx):
            return jf(idx, pay, qs)

        # NOTE: includes the [M]-row fat gather; subtract gather_fat
        dt, tot = timed_scalar_calls(f, idxs[:-1], warmup_input=idxs[-1])

    elif which == "extract_tala":
        idxs = rngs(N_CALLS + 1, (M, K), lo=0, hi=C, seed=1)
        qs = rngs(1, (M,), lo=0, hi=MAXQ, seed=50)[0]

        @jax.jit
        def jf(idx, p_tab, qs_a):
            p = p_tab[qs_a]
            nsel = jnp.take_along_axis(p, idx[..., None], axis=1)
            return nsel.astype(jnp.float32).sum()

        def f(idx):
            return jf(idx, pay, qs)

        dt, tot = timed_scalar_calls(f, idxs[:-1], warmup_input=idxs[-1])

    elif which == "extract_rowgather":
        # flat [(qslot, cand)] row id gather — M*K rows of 88 B
        idxs = rngs(N_CALLS + 1, (M, K), lo=0, hi=MAXQ * C, seed=1)

        @jax.jit
        def jf(idx, p_tab):
            nsel = p_tab.reshape(MAXQ * C, PAYW)[idx]       # [M, K, PAYW]
            return nsel.astype(jnp.float32).sum()

        def f(idx):
            return jf(idx, pay)

        dt, tot = timed_scalar_calls(f, idxs[:-1], warmup_input=idxs[-1])

    elif which == "gather_fat":
        # the [M]-row fat-cache gather alone (5.6 KB rows)
        qss = rngs(N_CALLS + 1, (M,), lo=0, hi=MAXQ, seed=1)

        @jax.jit
        def jf(qs, p_tab):
            return p_tab[qs].astype(jnp.float32).sum()

        def f(qs):
            return jf(qs, pay)

        dt, tot = timed_scalar_calls(f, qss[:-1], warmup_input=qss[-1])

    elif which == "gather_slim":
        # xyz-only candidate gather (meta + 3 ch = what selection needs)
        slim = jnp.asarray(
            np.random.default_rng(99).standard_normal(
                (MAXQ, C, 4)).astype(np.float32)).astype(jnp.bfloat16)
        qss = rngs(N_CALLS + 1, (M,), lo=0, hi=MAXQ, seed=1)

        @jax.jit
        def f(qs):
            return slim[qs].astype(jnp.float32).sum()

        dt, tot = timed_scalar_calls(f, qss[:-1], warmup_input=qss[-1])

    elif which == "pe_feat":
        from pointnerf2studio_tpu.ops.encoding import positional_encoding
        embs = rngs(N_CALLS + 1, (M, K, EMB), jnp.bfloat16, seed=2)

        @jax.jit
        def f(e):
            return positional_encoding(e, NFF).astype(jnp.float32).sum()

        dt, tot = timed_scalar_calls(f, embs[:-1], warmup_input=embs[-1])

    elif which == "pe_dists":
        from pointnerf2studio_tpu.ops.encoding import positional_encoding
        ds = rngs(N_CALLS + 1, (M, K, 6), jnp.bfloat16, seed=3)

        @jax.jit
        def f(d):
            return positional_encoding(d, NDF).astype(jnp.float32).sum()

        dt, tot = timed_scalar_calls(f, ds[:-1], warmup_input=ds[-1])

    elif which == "pe_feat_rec":
        # angle-doubling recurrence variant (encoding.py mode="rec")
        from pointnerf2studio_tpu.ops.encoding import positional_encoding
        embs = rngs(N_CALLS + 1, (M, K, EMB), jnp.bfloat16, seed=2)

        @jax.jit
        def f(e):
            return positional_encoding(
                e, NFF, mode="rec").astype(jnp.float32).sum()

        dt, tot = timed_scalar_calls(f, embs[:-1], warmup_input=embs[-1])

    elif which == "pe_dists_rec":
        from pointnerf2studio_tpu.ops.encoding import positional_encoding
        ds = rngs(N_CALLS + 1, (M, K, 6), jnp.bfloat16, seed=3)

        @jax.jit
        def f(d):
            return positional_encoding(
                d, NDF, mode="rec").astype(jnp.float32).sum()

        dt, tot = timed_scalar_calls(f, ds[:-1], warmup_input=ds[-1])

    elif which == "sin_raw":
        # raw transcendental rate: the PE pair for one dispatch is
        # ~2x(32*NFF + 6*NDF) = 252 sin+cos per (slot, K)
        xs = rngs(N_CALLS + 1, (M, K, 126), jnp.bfloat16, seed=4)

        @jax.jit
        def f(x):
            return (jnp.sin(x).astype(jnp.float32).sum()
                    + jnp.cos(x).astype(jnp.float32).sum())

        dt, tot = timed_scalar_calls(f, xs[:-1], warmup_input=xs[-1])

    elif which == "gemm_tower":
        # the pure MLP GEMMs on pre-built features (base 284->256->256,
        # head 263->256->256, density 256->1; color 280->128->128->3
        # per SLOT). bf16, f32 accum like the XLA path.
        r = np.random.default_rng(7)

        def w(i, o):
            return jnp.asarray(
                r.standard_normal((i, o)).astype(np.float32) * 0.05
            ).astype(jnp.bfloat16)

        W = dict(b1=w(284, HID), b2=w(HID, HID), h1=w(HID + 7, HID),
                 h2=w(HID, HID), d=w(HID, 1), c1=w(HID + 24, 128),
                 c2=w(128, 128), ch=w(128, 3))
        feats = rngs(N_CALLS + 1, (M * K, 284), jnp.bfloat16, seed=5)

        @jax.jit
        def f(x):
            def mm(a, ww):
                y = jnp.dot(a, ww, preferred_element_type=jnp.float32)
                return jnp.where(y > 0, y, 0.1 * y).astype(jnp.bfloat16)
            h = mm(x, W["b1"])
            h = mm(h, W["b2"])
            h = mm(jnp.pad(h, ((0, 0), (0, 7))), W["h1"])
            h = mm(h, W["h2"])
            sig = jnp.dot(h, W["d"], preferred_element_type=jnp.float32)
            agg = h.reshape(M, K, HID)[:, 0]                # stand-in agg
            cfeat = mm(jnp.pad(agg, ((0, 0), (0, 24))), W["c1"])
            cfeat = mm(cfeat, W["c2"])
            rgb = jnp.dot(cfeat, W["ch"],
                          preferred_element_type=jnp.float32)
            return sig.sum() + rgb.sum()

        dt, tot = timed_scalar_calls(f, feats[:-1], warmup_input=feats[-1])

    elif which == "geom":
        # cdelta / d2 / masking / shell eligibility on [M, C]
        rels = rngs(N_CALLS + 1, (M, C, 3), jnp.bfloat16, seed=6)
        meta = rngs(1, (M, C), lo=-1, hi=1 << 20, seed=51)[0]

        @jax.jit
        def f(rel):
            cdelta = rel.astype(jnp.float32) + 0.01
            d2 = jnp.sum(cdelta ** 2, -1)
            ok = (meta >= 0) & (d2 <= 0.1)
            shell = meta & 3
            eligible = shell == 0
            before = jnp.zeros((M, 1), jnp.int32)
            for s in range(1, 2):
                before = before + jnp.sum(
                    (ok & (shell == s - 1)).astype(jnp.int32), -1,
                    keepdims=True)
                eligible = eligible | ((shell == s) & (before < K))
            ok = ok & eligible
            return jnp.where(ok, d2, 0.0).sum()

        dt, tot = timed_scalar_calls(f, rels[:-1], warmup_input=rels[-1])

    elif which == "knn":
        d2s = rngs(N_CALLS + 1, (M, C), seed=8)

        @jax.jit
        def f(d2):
            neg_top, idx = jax.lax.top_k(-d2, K)
            return (-neg_top).sum() + idx.sum()

        dt, tot = timed_scalar_calls(f, d2s[:-1], warmup_input=d2s[-1])

    elif which == "weights":
        ds = rngs(N_CALLS + 1, (M, K, 6), seed=9)

        @jax.jit
        def f(d):
            w = 1.0 / jnp.maximum(
                jnp.linalg.norm(d[..., :3], axis=-1), 1e-6)
            w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-8)
            return w.sum()

        dt, tot = timed_scalar_calls(f, ds[:-1], warmup_input=ds[-1])

    elif which.startswith("krows"):
        # bisect the r3h extract_mode="krows" TPU compiler crash at
        # pipeline shapes. ROWW mirrors fast_render (1 meta f32 word +
        # PAYW/2 packed-bf16-pair f32 words).
        ROWW = PAYW // 2 + 1
        r = np.random.default_rng(99)
        rows = jnp.asarray(r.standard_normal(
            (MAXQ, C * ROWW)).astype(np.float32))           # fat cache
        slim = jnp.asarray(r.standard_normal(
            (MAXQ, C * 3)).astype(np.float32))              # slim view
        qss = rngs(N_CALLS + 1, (M,), lo=0, hi=MAXQ, seed=1)

        if which == "krows_bitcast":
            # suspect 1: bitcast-of-slice f32 -> bf16 (trailing-dim-2
            # insert + reshape) on the gathered slim view
            @jax.jit
            def jf(qs, s_tab):
                s3 = s_tab[qs].reshape(M, C, 3)
                meta = jax.lax.bitcast_convert_type(s3[..., 0], jnp.int32)
                relw = jax.lax.bitcast_convert_type(
                    s3[..., 1:], jnp.bfloat16).reshape(M, C, 4)
                return (relw.astype(jnp.float32).sum()
                        + (meta & 3).sum().astype(jnp.float32))

            def f(qs):
                return jf(qs, slim)

        elif which == "krows_flatgather":
            # suspect 2: [MAXQ*C, ROWW] flat-view K-row gather + payload
            # bitcast
            idxs = rngs(N_CALLS + 1, (M, K), lo=0, hi=MAXQ * C, seed=1)
            qss = idxs

            @jax.jit
            def jf(idx, r_tab):
                kr = r_tab.reshape(MAXQ * C, ROWW)[idx]     # [M, K, ROWW]
                nsel = jax.lax.bitcast_convert_type(
                    kr[..., 1:], jnp.bfloat16).reshape(M, K, PAYW)
                return nsel.astype(jnp.float32).sum()

            def f(idx):
                return jf(idx, rows)

        else:   # krows_full: both halves chained, as in the pipeline
            @jax.jit
            def jf(qs, s_tab, r_tab):
                s3 = s_tab[qs].reshape(M, C, 3)
                meta = jax.lax.bitcast_convert_type(s3[..., 0], jnp.int32)
                relw = jax.lax.bitcast_convert_type(
                    s3[..., 1:], jnp.bfloat16).reshape(M, C, 4)
                d2 = jnp.sum(relw[..., :3].astype(jnp.float32) ** 2, -1)
                key = jnp.where(meta >= 0, d2, jnp.inf)
                _, top_idx = jax.lax.top_k(-key, K)
                flat_ids = qs[:, None] * C + top_idx
                kr = r_tab.reshape(MAXQ * C, ROWW)[flat_ids]
                nsel = jax.lax.bitcast_convert_type(
                    kr[..., 1:], jnp.bfloat16).reshape(M, K, PAYW)
                return nsel.astype(jnp.float32).sum()

            def f(qs):
                return jf(qs, slim, rows)

        dt, tot = timed_scalar_calls(f, qss[:-1], warmup_input=qss[-1])

    else:
        raise SystemExit(f"unknown variant {which}")

    ms_full = dt * 1000.0 * report_scale
    print(f"microop {which}: {ms_full:7.2f} ms per {FULL} slots "
          f"({ms_full * 1e6 / FULL:6.1f} ns/slot)  [sum {tot:.1f}]",
        flush=True)


if __name__ == "__main__":
    main()

"""Stage-C decomposition + gather-vs-table-size + roofline, all on
SYNTHETIC data (no scene build — setup in seconds).

Questions answered:
  1. Does gather rate depend on TABLE SIZE (bitmask occupancy idea)?
  2. Where does stage C's ~180ms go (fat gather / knn / extract / MLP)?
  3. Roofline: achievable BW / matmul TFLOPs / transcendental rate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.models.aggregator import (
    aggregation_weight, decode_radiance, init_aggregator_params)
from pointnerf2studio_tpu.ops.camera import w2pers

R = 32768
M = 262_144
CAND = 64
AW = 40
ROWW = 4 + AW // 2
K = 8
DC = 131_072


def timed_v(fn, variants, n=8):
    out = jax.block_until_ready(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    base = timed_v(jax.jit(lambda x: x + 1),
                   [(jnp.zeros((8, 128)) + i,) for i in range(4)])
    print(f"dispatch {base*1e3:.2f} ms", flush=True)

    # ---------- 1. gather rate vs table size ----------
    D = 180
    for tbl_elems, name in [(4_194_304, "16MB int32"),
                            (524_288, "2MB int32"),
                            (131_072, "512KB int32"),
                            (16_384, "64KB int32")]:
        tbl = jax.random.randint(key, (tbl_elems,), -1, 99, jnp.int32)
        idxs = [jax.block_until_ready(jax.random.randint(
            jax.random.PRNGKey(i), (R, D), 0, tbl_elems, jnp.int32))
            for i in range(4)]
        f = jax.jit(lambda i, t: t[i])
        t = timed_v(f, [(i, tbl) for i in idxs]) - base
        print(f"gather [R,D] from {name:12}: {t*1e3:7.1f} ms", flush=True)

    # uint8 table
    tbl8 = jax.random.randint(key, (4_194_304,), 0, 2, jnp.int32).astype(
        jnp.uint8)
    idxs = [jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(i), (R, D), 0, 4_194_304, jnp.int32))
        for i in range(4)]
    f = jax.jit(lambda i, t: t[i])
    t = timed_v(f, [(i, tbl8) for i in idxs]) - base
    print(f"gather [R,D] from 4MB uint8  : {t*1e3:7.1f} ms", flush=True)

    # fewer gather rows: [M] rows (262k) from 16MB
    tbl = jax.random.randint(key, (4_194_304,), -1, 99, jnp.int32)
    idxm = [jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(i), (M,), 0, 4_194_304, jnp.int32))
        for i in range(4)]
    t = timed_v(f, [(i, tbl) for i in idxm]) - base
    print(f"gather [262k] from 16MB      : {t*1e3:7.1f} ms", flush=True)

    # ---------- 2. stage C pieces ----------
    agg = AggregatorConfig(compute_dtype="bfloat16")
    params = init_aggregator_params(jax.random.PRNGKey(1), agg)
    campos = jnp.zeros(3)
    camrot = jnp.eye(3)
    Rw2c = jnp.eye(3)
    Q = 229_376

    cand_fat = jax.block_until_ready(
        jax.random.normal(key, (Q, CAND * ROWW), jnp.float32) * 0.01)
    # overwrite meta column with plausible packed ids (90% filled)
    meta = jnp.where(
        jax.random.uniform(key, (Q, CAND)) < 0.9,
        jax.random.randint(key, (Q, CAND), 0, 558_000 * 4), -1)
    cf3 = cand_fat.reshape(Q, CAND, ROWW)
    cf3 = cf3.at[..., 3].set(
        jax.lax.bitcast_convert_type(meta, jnp.float32))
    cand_fat = jax.block_until_ready(cf3.reshape(Q, CAND * ROWW))

    qcs = [jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(i), (M,), 0, Q, jnp.int32)) for i in range(4)]

    fg = jax.jit(lambda i, t: t[i])
    t = timed_v(fg, [(i, cand_fat) for i in qcs]) - base
    print(f"C fat gather [262k x 1536]   : {t*1e3:7.1f} ms "
          f"{M*CAND*ROWW*4/max(t,1e-9)/1e9:5.0f} GB/s", flush=True)

    rows_vars = [jax.block_until_ready(fg(i, cand_fat)) for i in qcs]
    rds = [jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(40 + i), (R, 3))) for i in range(4)]
    srs = [jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(50 + i), (M,), 0, R, jnp.int32))
        for i in range(4)]
    sds = [jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(60 + i), (M,), 0, D, jnp.int32))
        for i in range(4)]

    @jax.jit
    def sC_knn(rows, sel_ray, sel_d, raydirs):
        rows3 = rows.reshape(M, CAND, ROWW)
        cxyz = rows3[..., :3]
        meta = jax.lax.bitcast_convert_type(rows3[..., 3], jnp.int32)
        shell = (meta & 3).astype(jnp.int32)
        rd_sel = raydirs[sel_ray]
        t_mid = 1.1 + (sel_d.astype(jnp.float32) + 0.5) * 0.01
        locs = campos + rd_sel * t_mid[:, None]
        d2 = jnp.sum((cxyz - locs[:, None, :]) ** 2, -1)
        ok = (meta >= 0) & (d2 <= 1e4)
        before = jnp.sum((ok & (shell == 0)).astype(jnp.int32), -1,
                         keepdims=True)
        ok = ok & ((shell == 0) | ((shell == 1) & (before < K)))
        x = jnp.where(ok, d2, jnp.inf)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, CAND), 1)
        ohs, hits = [], []
        for _ in range(K):
            am = jnp.argmin(x, axis=-1)
            hits.append(jnp.take_along_axis(x, am[:, None], -1)[:, 0]
                        < jnp.inf)
            ohs.append((col == am[:, None]) & ok)
            x = jnp.where(col == am[:, None], jnp.inf, x)
        return jnp.stack(ohs, 1), jnp.stack(hits, 1), locs, rd_sel

    knn_in = list(zip(rows_vars, srs, sds, rds))
    t = timed_v(sC_knn, knn_in) - base
    print(f"C knn select (8x argmin)     : {t*1e3:7.1f} ms", flush=True)
    knn_vars = [jax.block_until_ready(sC_knn(*a)) for a in knn_in]

    @jax.jit
    def sC_extract(rows, oh8b):
        rows3 = rows.reshape(M, CAND, ROWW)
        cxyz = rows3[..., :3]
        attrs = jax.lax.bitcast_convert_type(
            rows3[..., 4:], jnp.bfloat16).reshape(M, CAND, AW)
        nxyz = jnp.einsum("mkc,mcd->mkd", oh8b.astype(jnp.float32), cxyz)
        nattr = jnp.einsum("mkc,mca->mka", oh8b.astype(jnp.bfloat16), attrs)
        return nxyz, nattr

    ex_in = [(rw, kv[0]) for rw, kv in zip(rows_vars, knn_vars)]
    t = timed_v(sC_extract, ex_in) - base
    print(f"C extract (onehot einsums)   : {t*1e3:7.1f} ms", flush=True)
    ex_vars = [jax.block_until_ready(sC_extract(*a)) for a in ex_in]

    def mlp_body(nxyz, nattr, hits, locs, rd_sel, chunked):
        emb = nattr[..., :32].astype(jnp.float32)
        ndir = nattr[..., 33:36].astype(jnp.float32)
        ncol = nattr[..., 36:39].astype(jnp.float32)
        nei_pers = w2pers(nxyz, camrot, campos)
        lp = w2pers(locs, camrot, campos)[..., None, :]
        pdist = jnp.stack(
            [nei_pers[..., 0] * nei_pers[..., 2] - lp[..., 0] * lp[..., 2],
             nei_pers[..., 1] * nei_pers[..., 2] - lp[..., 1] * lp[..., 2],
             nei_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([nxyz - locs[:, None, :], pdist], -1)
        weight, emb2 = aggregation_weight(agg, emb, dists, hits, 0.008)
        vd = jnp.sum(rd_sel[..., :, None] * Rw2c, axis=-2)

        def one(args):
            return decode_radiance(
                params, agg, neigh_emb=args[0], neigh_color=args[1],
                neigh_dir=args[2], dists=args[3], weight=args[4],
                pnt_mask=args[5], viewdirs=args[6], Rw2c=Rw2c)

        mapped = [emb2, ncol, ndir, dists, weight, hits, vd]
        if not chunked:
            return one(mapped)
        n = (M + DC - 1) // DC
        pad = n * DC - M

        def cpad(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                           ).reshape((n, DC) + x.shape[1:])

        sig, rgb = jax.lax.map(one, tuple(cpad(x) for x in mapped))
        return sig.reshape(-1)[:M], rgb.reshape(-1, 3)[:M]

    mlp_in = [(ev[0], ev[1], kv[1], kv[2], kv[3])
              for ev, kv in zip(ex_vars, knn_vars)]
    fmlp = jax.jit(lambda *a: mlp_body(*a, chunked=True))
    t = timed_v(fmlp, mlp_in) - base
    print(f"C mlp (chunked {DC//1024}k)       : {t*1e3:7.1f} ms", flush=True)

    try:
        fmlp2 = jax.jit(lambda *a: mlp_body(*a, chunked=False))
        t = timed_v(fmlp2, mlp_in) - base
        print(f"C mlp (unchunked)            : {t*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print(f"C mlp (unchunked)            : FAILED {type(e).__name__}",
              flush=True)

    # ---------- 3. roofline ----------
    N = 134_217_728
    xs = [jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(i), (N,))) for i in range(4)]
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    t = timed_v(f, [(x,) for x in xs]) - base
    print(f"elementwise 537MB            : {t*1e3:7.1f} ms "
          f"{2*N*4/t/1e9:5.0f} GB/s", flush=True)

    A = [jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(i), (8192, 8192), jnp.bfloat16))
        for i in range(4)]
    Bm = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(9), (8192, 8192), jnp.bfloat16))
    fm = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
    t = timed_v(fm, [(a, Bm) for a in A]) - base
    print(f"matmul bf16 8192^3           : {t*1e3:7.1f} ms "
          f"{2*8192**3/t/1e12:5.1f} TFLOP/s", flush=True)

    Msk = 2_097_152
    X = [jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(i), (Msk, 284), jnp.bfloat16)) for i in range(4)]
    W = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(7), (284, 256), jnp.bfloat16))
    fsk = jax.jit(lambda x, w: jax.nn.leaky_relu(x @ w, 0.1))
    t = timed_v(fsk, [(x, W) for x in X]) - base
    print(f"skinny mm [2.1M,284]x256     : {t*1e3:7.1f} ms "
          f"{2*Msk*284*256/t/1e12:5.1f} TFLOP/s", flush=True)

    S = [jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(i), (Msk, 192), jnp.bfloat16)) for i in range(4)]
    ft = jax.jit(lambda x: jnp.sin(x))
    t = timed_v(ft, [(s,) for s in S]) - base
    print(f"sin [2.1M,192] bf16          : {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

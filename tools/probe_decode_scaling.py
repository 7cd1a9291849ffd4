"""Decode-tower scaling probe: ns/slot of the post-extract decode tail
(aggregation weights + decode_radiance) vs the slot-chunk size.

Question (VERDICT r4 #1c, PERF.md r3i): the tower runs ~92 ns/slot
inside the 4096-slot chunk map — ~24% of the bf16 MXU peak for its
~4.5 MFLOP/slot. Is that intrinsic (GEMM-bound at these shapes) or a
chunking/scheduling artifact that a bigger decode batch collapses?
If ns/slot drops materially at 32k-128k slots, the chunk pipeline
should split into phases: front half (gather/K-NN/extract, bounded by
[Mc, C] intermediates at 4k) materializing the compact [M, K, 44]
selection, then ONE wide decode pass.

Usage: python tools/probe_decode_scaling.py <Mc> [dec|dec_nw|tower]
  dec    aggregation_weight + decode_radiance  (the in-pipeline tail)
  dec_nw decode_radiance only (weights precomputed)
  tower  mlp towers only via decode_radiance with num_*_freqs=0 PE off
ONE variant per process (STATUS.md rule 1).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from tools.timing import congestion_sentinel, timed_scalar_calls


def main():
    Mc = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    variant = sys.argv[2] if len(sys.argv) > 2 else "dec"
    K = 8

    from pointnerf2studio_tpu.config import AggregatorConfig
    from pointnerf2studio_tpu.models.aggregator import (
        aggregation_weight, decode_radiance, init_aggregator_params)

    cfg = AggregatorConfig(compute_dtype="bfloat16", pe_mode="rec")
    params = init_aggregator_params(jax.random.PRNGKey(0), cfg)
    Rw2c = jnp.eye(3, dtype=jnp.float32)
    vsz = 0.008

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        emb = jnp.asarray(
            r.normal(size=(Mc, K, 32)).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        ncol = jnp.asarray(r.uniform(size=(Mc, K, 3)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        ndir = jnp.asarray(r.normal(size=(Mc, K, 3)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        dists = jnp.asarray(
            (r.normal(size=(Mc, K, 6)) * vsz).astype(np.float32))
        mask = jnp.asarray(r.uniform(size=(Mc, K)) < 0.78)
        vd = jnp.asarray(r.normal(size=(Mc, 3)).astype(np.float32))
        return emb, ncol, ndir, dists, mask, vd

    if variant == "dec":
        @jax.jit
        def f(args):
            emb, ncol, ndir, dists, mask, vd = args
            weight, emb2 = aggregation_weight(cfg, emb, dists, mask,
                                              vsz, params=params)
            sig, rgb = decode_radiance(
                params, cfg, neigh_emb=emb2, neigh_color=ncol,
                neigh_dir=ndir, dists=dists, weight=weight,
                pnt_mask=mask, viewdirs=vd, Rw2c=Rw2c)
            return sig.astype(jnp.float32).sum() + rgb.astype(
                jnp.float32).sum()
    elif variant == "dec_nw":
        @jax.jit
        def f(args):
            emb, ncol, ndir, dists, mask, vd = args
            weight = mask.astype(jnp.float32) * 0.125
            sig, rgb = decode_radiance(
                params, cfg, neigh_emb=emb, neigh_color=ncol,
                neigh_dir=ndir, dists=dists, weight=weight,
                pnt_mask=mask, viewdirs=vd, Rw2c=Rw2c)
            return sig.astype(jnp.float32).sum() + rgb.astype(
                jnp.float32).sum()
    else:
        raise SystemExit(f"unknown variant {variant}")

    inputs = [make_inputs(s) for s in range(1, 9)]
    warm = make_inputs(0)
    s_pre = congestion_sentinel()
    dt, tot = timed_scalar_calls(f, inputs, warmup_input=warm)
    s_post = congestion_sentinel()
    print(f"decode_scaling[{variant}] Mc={Mc}: {dt * 1e3:.2f} ms/call "
          f"= {dt / Mc * 1e9:.1f} ns/slot  (sum {tot:.1f}; "
          f"sentinel {s_pre:.1f}/{s_post:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

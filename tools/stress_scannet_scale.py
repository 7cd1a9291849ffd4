"""ScanNet/T&T-scale stress: a >=2M-point room on the REAL chip.

SURVEY §7 hard part 6 asks for measurements, not design claims: this
builds a room-scale scene at the ScanNet preset's voxel geometry
(vsize 0.008 x vscale 2 => dense [gx,gy,gz] tables would be several GB
and the flat voxel id overflows int32 at big extents — the sparse
HashGrid front-end is the point of the exercise), then:

  1. hash fat cache + fast EVAL path: renders 640x480-frame chunks,
     reports rays/s and HBM in use / peak;
  2. hash geo cache + fast differentiable TRAIN step at 4096 rays,
     reports it/s.

Sizing note measured here for PERF.md: the fat cache carries
cand_cap * ROWW * 4 B per query voxel (92 B/candidate); at room scale
the dilated query-voxel count reaches millions, so cand_cap 64 (chair
default) would exceed v5e HBM — this run uses --cand-cap 32 (the
chair-measured deviation of the nearest-32 truncation was 0.003% of
rays; bigger scenes on one chip trade exactly this).

Usage: python tools/stress_scannet_scale.py [n_points] [--cpu-smoke]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu-smoke" in sys.argv or "--build-npz" in sys.argv:
    # --build-npz: the 2M-point hash-cache BUILD programs crash the
    # remote TPU compiler helper at EVERY candidate width and EVERY
    # vsize rung (r5d: HTTP 500 even at n_q=157k — point-count-linked,
    # not n_q-linked). Local XLA:CPU compiles them fine: build on CPU,
    # save the cache arrays, and let a TPU process load + render.
    jax.config.update("jax_platforms", "cpu")

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.models import neural_points as npts
from pointnerf2studio_tpu.models.aggregator import init_aggregator_params


def make_room_cloud(n_points: int, seed: int = 0):
    """Points on the walls/floor/ceiling of a 6x6x3 room plus interior
    furniture blobs — ScanNet-like surface statistics."""
    rng = np.random.default_rng(seed)
    hx = hy = 3.0
    hz = 3.0
    n_wall = int(n_points * 0.75)
    n_blob = n_points - n_wall
    # sample faces proportionally to area
    faces = []
    areas = []
    # floor/ceiling (z = 0, hz)
    for z in (0.0, hz):
        faces.append(("z", z))
        areas.append(4 * hx * hy)
    for x in (-hx, hx):
        faces.append(("x", x))
        areas.append(2 * hy * hz)
    for y in (-hy, hy):
        faces.append(("y", y))
        areas.append(2 * hx * hz)
    areas = np.asarray(areas) / np.sum(areas)
    counts = rng.multinomial(n_wall, areas)
    pts = []
    for (axis, v), c in zip(faces, counts):
        u = rng.uniform(-1, 1, (c, 2))
        if axis == "z":
            p = np.stack([u[:, 0] * hx, u[:, 1] * hy,
                          np.full(c, v)], -1)
        elif axis == "x":
            p = np.stack([np.full(c, v), u[:, 0] * hy,
                          (u[:, 1] * 0.5 + 0.5) * hz], -1)
        else:
            p = np.stack([u[:, 0] * hx, np.full(c, v),
                          (u[:, 1] * 0.5 + 0.5) * hz], -1)
        pts.append(p)
    # furniture: 24 random boxes
    per = n_blob // 24
    for i in range(24):
        c = rng.uniform([-2.5, -2.5, 0.1], [2.5, 2.5, 1.2])
        half = rng.uniform(0.15, 0.6, 3)
        face = rng.integers(0, 3, per)
        sgn = rng.choice([-1.0, 1.0], per)
        u = rng.uniform(-1, 1, (per, 3)) * half
        p = c + u
        p[np.arange(per), face] = c[face] + sgn * half[face]
        pts.append(p)
    xyz = np.concatenate(pts, 0)[:n_points].astype(np.float32)
    n = xyz.shape[0]          # blob rounding can fall short of n_points
    xyz += rng.normal(0, 0.002, xyz.shape).astype(np.float32)
    colors = (np.abs(np.sin(xyz * 3.0)) * 0.8 + 0.1).astype(np.float32)
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    emb = (rng.standard_normal((n, 32)) * 0.1).astype(np.float32)
    conf = np.full((n, 1), 0.8, np.float32)
    return npts.from_arrays(xyz, emb, conf, dirs, colors)


def hbm_stats(tag):
    try:
        s = jax.local_devices()[0].memory_stats()
        rec = {"tag": tag,
               "bytes_in_use_gb": round(s["bytes_in_use"] / 2**30, 2),
               "peak_gb": round(s.get("peak_bytes_in_use", 0) / 2**30,
                                2)}
        print(json.dumps(rec), flush=True)
        return rec
    except Exception as e:
        print(f"hbm stats unavailable: {e}", flush=True)
        return None


def _flag_val(name, default=None):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main():
    smoke = "--cpu-smoke" in sys.argv
    build_npz = _flag_val("--build-npz")
    from_npz = _flag_val("--from-npz")
    args = [a for a in sys.argv[1:]
            if not a.startswith("--")
            and a not in (build_npz, from_npz)]
    n_points = int(args[0]) if args else (2_000_000 if not smoke
                                          else 80_000)
    cand_cap = 32
    # ScanNet preset geometry (dev_scripts/w_scannet_etf:
    # vsize 0.008, SR 24) at room extents; smoke shrinks everything
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.008,) * 3 if not smoke else (0.032,) * 3,
            vscale=(2, 2, 2), SR=24, K=8, P=12,
            max_o=4_000_000 if not smoke else 400_000,
            z_depth_dim=288 if not smoke else 96,
            ranges=(-3.2, -3.2, -0.2, 3.2, 3.2, 3.2),
            cand_cap=cand_cap, use_cache=False,
            compact_budget=8, ray_slot_budget=24, fast_chunk=4096,
            grid_mode="hash"),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
        near_plane=0.2, far_plane=9.0,
    )
    t0 = time.time()
    cloud = make_room_cloud(n_points)
    print(f"cloud: {n_points} points (+{time.time()-t0:.0f}s)",
          flush=True)

    from pointnerf2studio_tpu.data.synthetic import camera_rays
    from pointnerf2studio_tpu.models.fast_render import (
        FatCache, make_hash_fast_scene, measured_depth_window)
    from pointnerf2studio_tpu.ops.hash_grid import (
        build_hash_grid_from_points)

    params = None
    if build_npz or from_npz:
        # CPU-build / TPU-load split: the 2M-point hash-cache build
        # programs crash the REMOTE TPU compiler at every candidate
        # width and vsize rung (r5d queue: HTTP 500 even at n_q=157k),
        # but local XLA:CPU compiles and runs them fine. The build is
        # one-time per scene, so building on host and shipping the
        # arrays is the legitimate production path for scenes whose
        # builds the backend compiler cannot take.
        vs_mul = int(_flag_val("--vs-mul", "2"))
        cc = int(_flag_val("--cc", "32"))
        cfg = dataclasses.replace(cfg, query=dataclasses.replace(
            cfg.query, cand_cap=cc,
            vsize=tuple(v * vs_mul for v in cfg.query.vsize)))
        if build_npz:
            hg = build_hash_grid_from_points(cloud.xyz, cloud.alive,
                                             cfg.query)
            n_q = int(jax.device_get(hg.n_q))
            print(f"hash grid (cpu): n_q={n_q} "
                  f"(+{time.time()-t0:.0f}s)", flush=True)
            params = init_aggregator_params(jax.random.PRNGKey(0),
                                            cfg.agg)
            params["density_head"][0]["bias"] = (
                params["density_head"][0]["bias"] + 5.0)
            cache, rmin, svs = make_hash_fast_scene(cfg, cloud, hg,
                                                    params=params)
            print(f"fat cache built on cpu "
                  f"(+{time.time()-t0:.0f}s)", flush=True)
            from pointnerf2studio_tpu.models.fast_train import (
                make_hash_geo_scene)
            geo, _, _ = make_hash_geo_scene(cfg, cloud, hg)
            np.savez(
                build_npz,
                rows=np.asarray(cache.rows),
                n_q=np.asarray(cache.n_q),
                hash_table=np.asarray(cache.hash_table),
                logical_dims=np.asarray(cache.logical_dims),
                rmin=np.asarray(rmin), svs=np.asarray(svs),
                hg_ranges_min=np.asarray(hg.ranges_min),
                hg_dims=np.asarray(jax.device_get(hg.dims)),
                geo_rows=np.asarray(geo.rows),
                geo_n_q=np.asarray(geo.n_q),
                geo_hash=np.asarray(geo.hash_table),
                geo_dims=np.asarray(geo.logical_dims),
                vs_mul=vs_mul, cand_cap=cc)
            print(f"saved {build_npz} (+{time.time()-t0:.0f}s)",
                  flush=True)
            return
        z = np.load(from_npz)
        assert int(z["vs_mul"]) == vs_mul and int(z["cand_cap"]) == cc
        cache = FatCache(
            coor_2_qslot=None, rows=jnp.asarray(z["rows"]),
            n_q=jnp.asarray(z["n_q"]),
            hash_table=jnp.asarray(z["hash_table"]),
            logical_dims=jnp.asarray(z["logical_dims"]))
        rmin = jnp.asarray(z["rmin"])
        svs = jnp.asarray(z["svs"])
        hg_ranges_min = np.asarray(z["hg_ranges_min"])
        dims = [int(x) for x in z["hg_dims"]]
        n_q = int(z["n_q"])
        from pointnerf2studio_tpu.models.fast_train import GeoCache
        geo_loaded = GeoCache(
            coor_2_qslot=None, rows=jnp.asarray(z["geo_rows"]),
            n_q=jnp.asarray(z["geo_n_q"]),
            hash_table=jnp.asarray(z["geo_hash"]),
            logical_dims=jnp.asarray(z["geo_dims"]))
        print(f"cache loaded from {from_npz}: n_q={n_q} "
              f"cand_cap={cc} vsize x{vs_mul} "
              f"(+{time.time()-t0:.0f}s)", flush=True)
        cand_cap = cc

    if not from_npz:
        hg = build_hash_grid_from_points(cloud.xyz, cloud.alive,
                                         cfg.query)
        dims = [int(x) for x in np.asarray(jax.device_get(hg.dims))]
        n_q = int(jax.device_get(hg.n_q))
        print(f"hash grid: logical dims {dims} "
              f"({dims[0]*dims[1]*dims[2]/1e9:.2f}G logical voxels), "
              f"n_q={n_q} (+{time.time()-t0:.0f}s)", flush=True)
        est_gb = n_q * cand_cap * 23 * 4 / 2**30
        print(f"fat cache estimate: {est_gb:.1f} GiB "
              f"(cand_cap={cand_cap})", flush=True)

    params = init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
    params["density_head"][0]["bias"] = (
        params["density_head"][0]["bias"] + 5.0)
    # measured single-chip envelope (r4c): n_q ~2.8-3.1M at cand_cap
    # 32 RESOURCE_EXHAUSTs a 16 GB v5e during the cache build (and one
    # earlier run crashed the backend compiler outright) — the
    # intended path for this scale is the point-sharded slab cache
    # over a 'points' mesh axis (parallel/sharding.py). Single-chip,
    # degrade cand_cap until the build fits and SAY SO.
    cache = None if not from_npz else cache
    for vs_mul in (() if from_npz else (1, 2, 4)):
        if vs_mul > 1:
            # the TPU backend compiler crashes on hash-cache BUILD
            # programs past ~3M query voxels at EVERY candidate width
            # (fenced in make_hash_fast_scene); coarsening vsize cuts
            # n_q ~4-8x per doubling — the single-chip degradation
            # rung after cand_cap
            cfg = dataclasses.replace(cfg, query=dataclasses.replace(
                cfg.query, vsize=tuple(v * vs_mul for v in
                                       (0.008,) * 3)))
            print(f"coarsening vsize x{vs_mul} "
                  f"(query-voxel count over the build fence)",
                  flush=True)
            hg = build_hash_grid_from_points(cloud.xyz, cloud.alive,
                                             cfg.query)
            n_q = int(jax.device_get(hg.n_q))
            dims = [int(x) for x in np.asarray(jax.device_get(hg.dims))]
            print(f"hash grid rebuilt: dims {dims} n_q={n_q} "
                  f"(+{time.time()-t0:.0f}s)", flush=True)
        for cc in (cand_cap, 16, 8):
            try:
                cfg = dataclasses.replace(cfg, query=dataclasses.replace(
                    cfg.query, cand_cap=cc))
                cache, rmin, svs = make_hash_fast_scene(cfg, cloud, hg,
                                                        params=params)
                jax.block_until_ready(cache.rows)
                if cc != cand_cap or vs_mul > 1:
                    print(f"degraded to cand_cap={cc} vsize x{vs_mul} "
                          f"(approximate beyond nearest-{cc})",
                          flush=True)
                cand_cap = cc
                break
            except Exception as e:
                print(f"cache build failed at cand_cap={cc}: "
                      f"{type(e).__name__} {str(e)[:100]}", flush=True)
                cache = None
        if cache is not None:
            break
    if cache is None:
        raise SystemExit("cache build failed at every tier")
    print(f"fat cache built (+{time.time()-t0:.0f}s)", flush=True)
    hbm_stats("after_cache")

    # camera inside the room, looking across it
    campos = jnp.asarray([0.0, -2.4, 1.4])
    camrot = jnp.asarray([[1.0, 0, 0], [0, 0.0, 1.0], [0, -1.0, 0.0]])
    H, W = (480, 640) if not smoke else (48, 64)
    rays = camera_rays(campos, camrot, H, W, 580.0 if not smoke else 58.0)
    # r5e: at R=65536 x dw=216 the hash render program's buffer
    # assignment reaches 15.4 GiB and the remote compiler 500s /
    # OOMs; room-scale scenes render in smaller ray chunks
    R = (16_384 if from_npz else 65_536) if not smoke else 1_024
    near, far = jnp.asarray(cfg.near_plane), jnp.asarray(cfg.far_plane)

    dw = measured_depth_window(
        campos, np.asarray(jax.device_get(rays)), float(near),
        float(far), cfg.query.z_depth_dim,
        (hg_ranges_min if from_npz else jax.device_get(hg.ranges_min)),
        dims, cfg.query.scaled_vsize)
    cfg_r = dataclasses.replace(cfg, query=dataclasses.replace(
        cfg.query, depth_window=min(dw, cfg.query.z_depth_dim - 1)))
    print(f"measured depth window {dw} of D={cfg.query.z_depth_dim}",
          flush=True)

    from pointnerf2studio_tpu.models.fast_render import (
        fast_render_rays_jit)
    ray_vars = []
    nchunks = rays.shape[0] // R
    for i in range(min(nchunks, 9)):
        ray_vars.append(jax.block_until_ready(rays[i * R:(i + 1) * R]))
    while len(ray_vars) < 9:
        ray_vars.append(ray_vars[len(ray_vars) % max(nchunks, 1)])

    def render(r):
        out = fast_render_rays_jit(
            params, cloud.Rw2c, cache, campos, camrot, r, near, far,
            cfg_r, rmin, svs)
        return (out.coarse_raycolor.astype(jnp.float32).sum(),
                out.dw_overflow)

    from tools.timing import timed_scalar_calls
    dt, _ = timed_scalar_calls(
        lambda r: render(r)[0], ray_vars[:8], warmup_input=ray_vars[8])
    dw_of = int(jax.device_get(render(ray_vars[0])[1]))
    print(json.dumps({
        "metric": "scannet_scale_render_rays_per_sec",
        "value": round(R / dt, 1), "n_points": n_points,
        "n_query_voxels": n_q, "dw_overflow": dw_of}), flush=True)
    hbm_stats("after_render")

    # ---- differentiable train step over the hash geo cache ----
    from pointnerf2studio_tpu.models.fast_train import make_hash_geo_scene
    from pointnerf2studio_tpu.train.trainer import create_train_state
    from pointnerf2studio_tpu.models.fast_train import make_fast_train_step

    cfg_t = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, fast_path=True))
    if from_npz:
        geo, g_rmin, g_svs = geo_loaded, rmin, svs
    else:
        geo, g_rmin, g_svs = make_hash_geo_scene(cfg_t, cloud, hg)
    state = create_train_state(params, cloud, cfg_t)
    step = make_fast_train_step(cfg_t)
    B = 4096 if not smoke else 512
    gt = jnp.full((B, 3), 0.4, jnp.float32)

    def one_step(i):
        nonlocal state
        state, aux = step(state, geo, g_rmin, g_svs, campos, camrot,
                          ray_vars[i % 8][:B], gt, near, far,
                          jax.random.PRNGKey(i))
        return aux["total"]

    one_step(8)                                      # compile
    t1 = time.time()
    tots = [one_step(i) for i in range(8)]
    float(jax.device_get(jnp.stack(tots).sum()))     # fetch barrier
    dt_s = (time.time() - t1) / 8
    print(json.dumps({
        "metric": "scannet_scale_train_it_per_sec",
        "value": round(1.0 / dt_s, 2), "rays_per_batch": B}),
        flush=True)
    hbm_stats("after_train")


if __name__ == "__main__":
    main()

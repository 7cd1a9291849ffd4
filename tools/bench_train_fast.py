"""Fast-train-path throughput at reference scale (4096-ray batches),
vs tools/bench_train.py's legacy-path number (r1: 13.0 it/s)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_train import (
    make_fast_train_step, make_geo_scene)
from pointnerf2studio_tpu.train.trainer import create_train_state


def _march_plan_rays(scene, chair):
    """Representative pixel-sampled rays for march planning (same
    distribution as the benched batches, larger sample)."""
    import jax
    import numpy as np

    from pointnerf2studio_tpu.data.synthetic import camera_rays
    if chair:
        frame = camera_rays(scene.campos, scene.camrotc2w, 800, 800,
                            1111.1)
        idx = np.random.default_rng(7).choice(frame.shape[0], 16384,
                                              replace=False)
        return np.asarray(jax.device_get(frame))[idx]
    return np.asarray(jax.device_get(
        camera_rays(scene.campos, scene.camrotc2w, 8, 512, 320.0)))


def main():
    # positional args keep the old queue-item syntax; flags extend it:
    #   --chair      chair scene at reference geometry (D=400, [2, 6]),
    #                rays pixel-sampled from a full 800x800 frame so
    #                the miss fraction is realistic (~45-55%)
    #   --rb <n|auto> train-path ray packing (auto sizes from the max
    #                per-batch slab-hit count of the benched batches)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    chair = "--chair" in sys.argv
    rb = None
    if "--rb" in sys.argv:
        rb = sys.argv[sys.argv.index("--rb") + 1]
        args = [a for a in args if a != rb]
    remat = "none"
    if "--remat" in sys.argv:      # sel | full (TrainConfig.remat)
        remat = {"sel": "selection"}.get(
            sys.argv[sys.argv.index("--remat") + 1],
            sys.argv[sys.argv.index("--remat") + 1])
        args = [a for a in args if a not in ("sel", "full", remat)]
    fast_chunk = int(args[0]) if len(args) > 0 else 4096
    budget = int(args[1]) if len(args) > 1 else 8
    # args[2]: "onehot" (default), "topk", or "topk-packed"
    mode = args[2] if len(args) > 2 else "onehot"
    compact = "topk" if mode.startswith("topk") else "onehot"
    composite = "packed" if mode.endswith("packed") else "grid"
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000,
            z_depth_dim=400 if chair else 180,
            compact_budget=budget, use_cache=False,
            fast_chunk=fast_chunk, compact_mode=compact,
            composite_mode=composite),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    if remat != "none":
        import dataclasses as _dc
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, remat=remat))
    if "--cp" in sys.argv:       # exact candidate reduction (cand_prune)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, query=_dc.replace(cfg.query,
                                                 cand_prune=True))
    t0 = time.time()
    if chair:
        from pointnerf2studio_tpu.data.synthetic import make_chair_scene
        scene = make_chair_scene(n_points=558_000, cfg=cfg)
    else:
        scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    if "--march" in sys.argv:
        # jitter-aware train march: plan staged fuel/buckets from the
        # unjittered host sim, widened for the jittered device walk
        # (jitter shrinks skips by (1 + j/2) and batches vary step to
        # step); mc_overflow in the step aux re-verifies on device
        import dataclasses as _dc

        from pointnerf2studio_tpu.ops.march import (
            build_march_table, plan_march)
        occ = jnp.asarray(scene.grid.coor_occ)
        tbl = np.asarray(jax.device_get(build_march_table(
            jnp.where(occ.astype(bool), 0, -1))))
        q = cfg.query
        capm = min(q.SR, q.ray_slot_budget or q.SR, q.z_depth_dim)
        steps, buckets = plan_march(
            tbl, np.asarray(jax.device_get(scene.grid.ranges_min)),
            q.scaled_vsize, np.asarray(jax.device_get(scene.campos)),
            _march_plan_rays(scene, chair),
            float(2.0 if chair else 1.1), float(6.0 if chair else 2.9),
            q.z_depth_dim, capm, slack=1.6)
        steps = tuple(int(s * 1.5) + 4 for s in steps)
        print(f"march steps {steps} buckets {buckets}", flush=True)
        cfg = _dc.replace(cfg, query=_dc.replace(
            cfg.query, march_steps=steps, march_buckets=buckets))
    geo, rmin, svs = make_geo_scene(cfg, scene.cloud, scene.grid)
    jax.block_until_ready(geo.rows)
    print(f"scene+geo build {time.time()-t0:.0f}s", flush=True)

    B = 4096
    ray_vars = []
    if chair:
        # reference sampling: 4096 random pixels of an 800x800 frame
        frame = camera_rays(scene.campos, scene.camrotc2w, 800, 800,
                            1111.1)
        rng = np.random.default_rng(0)
        for i in range(4):
            idx = rng.choice(frame.shape[0], B, replace=False)
            ray_vars.append(jax.block_until_ready(frame[idx]))
        near, far = jnp.asarray(2.0), jnp.asarray(6.0)
    else:
        rd0 = camera_rays(scene.campos, scene.camrotc2w, 8, 512, 320.0)
        for i in range(4):
            r = rd0 + 1e-4 * jax.random.normal(
                jax.random.PRNGKey(i), rd0.shape)
            r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
            ray_vars.append(jax.block_until_ready(
                jnp.concatenate([r] * (B // r.shape[0] + 1))[:B]))
        near, far = jnp.asarray(1.1), jnp.asarray(2.9)
    gt = jnp.full((B, 3), 0.4, jnp.float32)

    if rb is not None:
        import dataclasses

        from pointnerf2studio_tpu.models.fast_render import slab_hit_mask
        if rb == "auto":
            hits = max(int(slab_hit_mask(
                scene.campos, rv, float(near), float(far),
                cfg.query.z_depth_dim, rmin, geo.coor_2_qslot.shape,
                svs, jitter=cfg.train.jitter).sum()) for rv in ray_vars)
            # training batches vary step to step: leave 25% headroom
            rbn = min(B, (int(hits * 1.25) + 255) // 256 * 256)
        else:
            rbn = int(rb)
        print(f"ray_budget={rbn} of B={B}", flush=True)
        if rbn < B:
            cfg = dataclasses.replace(
                cfg, query=dataclasses.replace(cfg.query, ray_budget=rbn))

    state = create_train_state(scene.params, scene.cloud, cfg)

    # --fwd: forward + loss only (no autodiff); --grad: value_and_grad
    # without the optimizer update. Together with the full step these
    # decompose the step cost into forward / backward / optimizer.
    # --grad-params / --grad-attrs further split the backward: grads
    # wrt the MLP tower only vs wrt the trainable point attributes only
    # (the attr path ends in [M*K]-row scatter-adds into the cloud —
    # the suspected backward cost).
    stage = ("fwd" if "--fwd" in sys.argv
             else "gradp" if "--grad-params" in sys.argv
             else "grada" if "--grad-attrs" in sys.argv
             else "grad" if "--grad" in sys.argv else "full")
    # --prefix <name>: cumulative forward cutoffs (fast_train_render
    # debug_prefix: raygen|front|gather|knn|attrs|decode) — deltas
    # between consecutive prefixes attribute the forward's cost the
    # way tools/probe_chunk_stages.py does for the eval chunk
    prefix = None
    if "--prefix" in sys.argv:
        prefix = sys.argv[sys.argv.index("--prefix") + 1]
        stage = "fwd"
    if stage == "full":
        step_fn = make_fast_train_step(cfg)
    else:
        from pointnerf2studio_tpu.models.fast_train import (
            fast_train_render)
        from pointnerf2studio_tpu.train.loss import compute_losses

        # geo/campos/gt/... are jit ARGUMENTS (closed-over arrays ship
        # as literals to the remote compiler -> HTTP 413 at chair scale)
        def loss_fn(params, pt, st, geo_, cpos, crot, gt_, rays, key):
            points = st.points.with_trainable(pt)
            out = fast_train_render(
                params, points, geo_, cpos, crot,
                rays, near, far, cfg, rmin, svs, key=key, training=True,
                debug_prefix=prefix)
            return compute_losses(out, gt_, cfg.train)[0]

        if stage == "fwd":
            @jax.jit
            def step_fn(st, geo_, cpos, crot, gt_, rays, key):
                total = loss_fn(st.params, st.points.trainable(), st,
                                geo_, cpos, crot, gt_, rays, key)
                return st, {"total": total}
        else:
            argnums = {"grad": (0, 1), "gradp": (0,),
                       "grada": (1,)}[stage]

            @jax.jit
            def step_fn(st, geo_, cpos, crot, gt_, rays, key):
                total, grads = jax.value_and_grad(
                    loss_fn, argnums=argnums)(
                        st.params, st.points.trainable(), st,
                        geo_, cpos, crot, gt_, rays, key)
                # fold the grads into the loss scalar so nothing is DCE'd
                gsum = sum(jnp.sum(jnp.abs(g))
                           for g in jax.tree.leaves(grads))
                return st, {"total": total + 0.0 * gsum}

    def call(s):
        if stage == "full":
            return step_fn(state, geo, rmin, svs, scene.campos,
                           scene.camrotc2w, ray_vars[s % 4], gt, near,
                           far, jax.random.PRNGKey(s))
        return step_fn(state, geo, scene.campos, scene.camrotc2w, gt,
                       ray_vars[s % 4], jax.random.PRNGKey(s))

    state, aux = call(0)
    # block_until_ready is a NO-OP on the axon backend — a host fetch
    # of the loss scalar is the only real barrier (the chained state
    # makes every step a dependency of the last step's loss)
    float(jax.device_get(aux["total"]))
    print(f"compiled (+{time.time()-t0:.0f}s) stage={stage}", flush=True)

    n = 30
    t1 = time.perf_counter()
    for s in range(n):
        state, aux = call(s)
    float(jax.device_get(aux["total"]))
    dt = (time.perf_counter() - t1) / n
    tag = (("chair " if chair else "") + ("rb " if rb is not None else "")
           + (f"{stage}-only " if stage != "full" else "")
           + (f"prefix={prefix} " if prefix else ""))
    print(f"fast train step {tag}ch={fast_chunk} b={budget} {mode}: "
          f"{dt*1e3:.1f} ms "
          f"-> {1/dt:.1f} it/s, {B/dt:,.0f} rays/s "
          f"(legacy r1: 13.0 it/s; reference ~6-7 it/s)")
    if "rb_overflow" in aux:
        n_over = int(jax.device_get(aux["rb_overflow"]))
        print(f"rb_overflow (last step): {n_over} "
              f"{'OK' if n_over == 0 else 'DROPPED RAYS — inexact'}")
    if "mc_overflow" in aux:
        n_over = int(jax.device_get(aux["mc_overflow"]))
        print(f"mc_overflow (last step): {n_over} "
              f"{'OK' if n_over == 0 else 'UNFINISHED RAYS — inexact'}")


if __name__ == "__main__":
    main()

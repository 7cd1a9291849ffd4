"""Train-step stage budget on the real chip (one variant per process —
the backend phantoms repeated distinct programs; see STATUS.md).

Variants decompose the 4096-ray train step: full step, forward-only
loss, per-group grads, optimizer-only, and the render forward without
loss. Honest methodology: varied ray inputs, block at end, 30 reps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.render import render_rays
from pointnerf2studio_tpu.train.loss import compute_losses
from pointnerf2studio_tpu.train.trainer import (
    create_train_state, make_train_step)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=budget),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    jax.block_until_ready(scene.grid.cache.cand_pack)
    print(f"scene build {time.time()-t0:.0f}s", flush=True)

    B = 4096
    rd0 = camera_rays(scene.campos, scene.camrotc2w, 8, 512, 320.0)
    ray_vars = []
    for i in range(4):
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (B // r.shape[0] + 1))[:B]))
    gt = jnp.full((B, 3), 0.4, jnp.float32)
    near, far = jnp.asarray(1.1), jnp.asarray(2.9)
    state = create_train_state(scene.params, scene.cloud, cfg)

    def timeit(tag, f, *extra):
        out = jax.block_until_ready(f(ray_vars[0], jax.random.PRNGKey(0)))
        t1 = time.perf_counter()
        n = 30
        for s in range(n):
            out = f(ray_vars[s % 4], jax.random.PRNGKey(s))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t1) / n
        print(f"{tag:24}: {dt*1e3:7.1f} ms -> {1/dt:6.1f} it/s",
              flush=True)

    # NOTE: state/points/grid must be ARGUMENTS of the jitted fns —
    # closures become constants shipped to the remote compiler
    # (multi-GB captures -> HTTP 413 / hangs; STATUS.md rule 4).
    if which == "full":
        step_fn = make_train_step(cfg)
        st = [state]

        def f(rays, key):
            st[0], aux = step_fn(st[0], scene.grid, scene.campos,
                                 scene.camrotc2w, rays, gt, near, far, key)
            return aux["total"]
        timeit(f"full step b{budget}", f)
    elif which == "fwd":
        @jax.jit
        def fj(params, points, grid, rays, key):
            out = render_rays(params, points, grid,
                              scene.campos, scene.camrotc2w, rays, near,
                              far, cfg, key=key, training=True)
            return compute_losses(out, gt, cfg.train)[0]

        def f(rays, key):
            return fj(state.params, state.points, scene.grid, rays, key)
        timeit(f"forward loss b{budget}", f)
    elif which == "fwdnj":
        @jax.jit
        def fj(params, points, grid, rays):
            out = render_rays(params, points, grid,
                              scene.campos, scene.camrotc2w, rays, near,
                              far, cfg, training=False)
            return compute_losses(out, gt, cfg.train)[0]

        def f(rays, key):
            return fj(state.params, state.points, scene.grid, rays)
        timeit(f"fwd nojitter b{budget}", f)
    elif which == "gradf":
        @jax.jit
        def fj(params, points, grid, rays, key):
            def loss(params):
                out = render_rays(params, points, grid,
                                  scene.campos, scene.camrotc2w, rays,
                                  near, far, cfg, key=key, training=True)
                return compute_losses(out, gt, cfg.train)[0]
            return jax.grad(loss)(params)

        def f(rays, key):
            return fj(state.params, state.points, scene.grid, rays, key)
        timeit(f"grad fields b{budget}", f)
    elif which == "gradp":
        @jax.jit
        def fj(params, points, grid, rays, key):
            def loss(pt):
                pts = points.with_trainable(pt)
                out = render_rays(params, pts, grid,
                                  scene.campos, scene.camrotc2w, rays,
                                  near, far, cfg, key=key, training=True)
                return compute_losses(out, gt, cfg.train)[0]
            return jax.grad(loss)(points.trainable())

        def f(rays, key):
            return fj(state.params, state.points, scene.grid, rays, key)
        timeit(f"grad points b{budget}", f)
    elif which == "gradboth":
        @jax.jit
        def fj(params, points, grid, rays, key):
            def loss(params, pt):
                pts = points.with_trainable(pt)
                out = render_rays(params, pts, grid,
                                  scene.campos, scene.camrotc2w, rays,
                                  near, far, cfg, key=key, training=True)
                return compute_losses(out, gt, cfg.train)[0]
            return jax.grad(loss, argnums=(0, 1))(params,
                                                  points.trainable())

        def f(rays, key):
            return fj(state.params, state.points, scene.grid, rays, key)
        timeit(f"grad both b{budget}", f)
    elif which == "opt":
        # optimizer-only: apply fixed zero grads
        from pointnerf2studio_tpu.train.trainer import make_optimizers
        import optax
        tx_f, tx_p = make_optimizers(cfg)

        @jax.jit
        def fj(state, rays):
            zf = jax.tree.map(jnp.zeros_like, state.params)
            zp = jax.tree.map(jnp.zeros_like, state.points.trainable())
            uf, of = tx_f.update(zf, state.opt_state_fields, state.params)
            p2 = optax.apply_updates(state.params, uf)
            up, op = tx_p.update(zp, state.opt_state_points,
                                 state.points.trainable())
            t2 = optax.apply_updates(state.points.trainable(), up)
            return (jax.tree.leaves(p2)[0].sum()
                    + jax.tree.leaves(t2)[0].sum() + rays.sum())

        def f(rays, key):
            return fj(state, rays)
        timeit("optimizer only", f)
    else:
        raise SystemExit(f"unknown variant {which}")


if __name__ == "__main__":
    main()

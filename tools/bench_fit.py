"""fit() WALL-CLOCK throughput (it/s of 4096-ray steps) on a chair-
scale synthetic scene — the end-to-end train-loop number including
sampling, logging, and dispatch (tools/bench_train_fast.py measures
the raw jitted step; the gap between the two is host overhead).

Usage: python tools/bench_fit.py [steps] [--host-sampler] [--legacy]
                                 [--spd K]   (steps per dispatch)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    host_sampler = "--host-sampler" in sys.argv
    legacy = "--legacy" in sys.argv
    spd = (int(sys.argv[sys.argv.index("--spd") + 1])
           if "--spd" in sys.argv else 1)

    import jax

    from pointnerf2studio_tpu.data.blender import BlenderDataset
    from pointnerf2studio_tpu.data.synthetic import make_chair_scene
    from pointnerf2studio_tpu.train.loop import fit
    from tools.probe_bench_variants import base_cfg

    cfg = base_cfg(fast_chunk=4096, compact_mode="topk",
                   composite_mode="packed")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, rays_per_batch=4096, fast_path=not legacy,
            device_sampling=not host_sampler, prune_iter=0, prob_freq=0,
            steps_per_dispatch=spd),
        near_plane=2.0, far_plane=6.0)

    t0 = time.time()
    scene = make_chair_scene(n_points=558_000, cfg=cfg)

    # a tiny 4-view dataset: random textures are fine — this measures
    # throughput, not convergence
    V, H, W = 4, 400, 400
    rng = np.random.default_rng(0)
    images = rng.random((V, H, W, 3)).astype(np.float32)
    poses = []
    for v in range(V):
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = np.asarray(scene.camrotc2w)
        p[:3, 3] = np.asarray(scene.campos)
        poses.append(p)
    intr = np.array([[555.5, 0, W / 2], [0, 555.5, H / 2], [0, 0, 1]],
                    np.float32)
    ds = BlenderDataset(images=images, poses=np.stack(poses),
                        intrinsics=intr, near=2.0, far=6.0,
                        split="train")
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    out = f"/tmp/bench_fit_{os.getpid()}"
    t0 = time.time()
    fit(cfg, ds, scene.params, scene.cloud, out, max_steps=steps,
        print_freq=100, save_freq=0, resume=False)
    dt = time.time() - t0
    # first ~50 steps are compile; report the tail via the logger's own
    # it_per_sec lines plus the crude total
    print(f"fit total: {steps} steps in {dt:.1f}s = {steps/dt:.2f} it/s "
          f"({'dev' if not host_sampler else 'host'}-sampler, "
          f"{'legacy' if legacy else 'fast'} path, spd={spd})",
          flush=True)


if __name__ == "__main__":
    main()

"""pointnerf2studio_tpu: a TPU-native Point-NeRF framework.

A ground-up JAX/XLA/Pallas re-design of Point-NeRF-in-Nerfstudio
(reference: SHUzhekiNg/pointnerf2studio). Point-based neural radiance
fields: radiance/density decoded from features of the K nearest neural
points around each ray sample, with an MVSNet point-generation pipeline,
point pruning/growing, and multi-chip rendering via `shard_map` over a
ray mesh axis.

Design stance (vs. the CUDA/torch reference):
  * fixed shapes + validity masks everywhere (no dynamic ray compaction),
  * one jitted render step (ray gen -> voxel query -> K-NN gather ->
    MLP tower -> compositing),
  * voxel grid built lazily (only when points change), not per step,
  * deterministic PRNG keys instead of wall-clock seeding.
"""

__version__ = "0.1.0"

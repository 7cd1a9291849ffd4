"""Configuration tree for the TPU Point-NeRF framework.

One frozen dataclass replaces the reference's two config systems (the
~200-flag argparse `options/` tree and the nerfstudio dataclass config,
reference: pointnerf/options/base_options.py:8-182 and
pointnerf/nerfstudio/studio_model.py:61-118). Field names and defaults
follow the studio `PointNerfConfig` so users of the reference find the
same knobs. Per-scene presets (the reference's dev_scripts/*.sh) live in
`pointnerf2studio_tpu/data/presets.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class QueryConfig:
    """Voxel-grid neighbor query hyperparameters.

    Canonical NeRF-Synthetic values from the reference
    (pointnerf/dev_scripts/w_n360/chair_points.sh:50-61,
    pointnerf/nerfstudio/studio_model.py:94-111).
    """
    vsize: Tuple[float, float, float] = (0.004, 0.004, 0.004)
    vscale: Tuple[int, int, int] = (2, 2, 2)
    kernel_size: Tuple[int, int, int] = (3, 3, 3)   # K-NN search window (voxels)
    query_size: Tuple[int, int, int] = (3, 3, 3)    # occupancy dilation window
    radius_limit_scale: float = 4.0                 # radius = scale * max(vsize_xy)
    ranges: Tuple[float, float, float, float, float, float] = (
        -1.2, -1.2, -1.2, 1.2, 1.2, 1.2)
    z_depth_dim: int = 400       # raw stratified samples per ray (D)
    SR: int = 80                 # shading slots per ray
    K: int = 8                   # neighbors per shading point
    max_o: int = 1_000_000       # occupied-voxel capacity
    P: int = 12                  # points per voxel capacity
    NN: int = 2
    # Pad dense grid dims up to a multiple of this to stabilize jit caches.
    grid_dim_pad: int = 32
    # Voxel-grid backend: "dense" ([gx, gy, gz] tables, the default for
    # object-scale scenes), "hash" (the sparse bucket table of
    # ops/hash_grid.py for T&T/ScanNet-scale extents whose dense tables
    # would not fit HBM), or "auto" (dense while feasible, else hash).
    # Hash mode requires the fast train/eval paths (legacy render,
    # prob-mode growing, coarse_step and fused knn are dense-only).
    grid_mode: str = "auto"
    # Average valid shading slots per ray the MLP tower is provisioned
    # for: the render step sorts (ray, slot) pairs by validity and only
    # the first R*compact_budget reach the K-NN + MXU (the TPU
    # equivalent of the reference's masked_select compaction,
    # studio_model.py:310-315). 0 disables (budget = SR). Overflowing
    # valid slots beyond the budget are dropped deterministically.
    compact_budget: int = 16
    # If True, reproduce the reference's layered search: stop expanding
    # Chebyshev shells once a completed shell has yielded >= K candidates.
    layered_search: bool = True
    # Candidate cache: per dilated-occupied voxel, a precomputed list of
    # the neighborhood's candidate points (built once per grid rebuild).
    # Turns the per-shading-point K-NN from ~27*P row gathers into ONE
    # fat-row gather — the decisive TPU optimization (XLA gathers are
    # row-count-bound). Exact vs the scan search when a neighborhood
    # holds <= cand_cap candidates; beyond that the nearest-to-center
    # candidates per shell are kept.
    use_cache: bool = True
    cand_cap: int = 64
    # EXACT build-time candidate reduction (ops/query.
    # candidate_keep_mask): drop candidates that can never be among the
    # K selected neighbors for ANY shading location in their voxel
    # (radius-infeasible anywhere, or K provably-closer same-or-inner-
    # shell candidates), then store rows at the max KEPT width. Every
    # C-scaled stage (fat gather bytes, candidate geometry, the extract
    # einsum) shrinks by the same factor; selection is bit-exact
    # (tests/test_candidate_cache.py). Chip pricing: cand_cap 64 -> 32
    # alone measured 94.9 -> 78.5 ms per 65k rays (PERF.md r4).
    cand_prune: bool = False
    # Capacity for dilated-occupied (query) voxels; 0 -> 4 * max_o.
    max_q: int = 0
    # Fast-path per-ray shading-slot layout cap (models/fast_render.py).
    # 0 -> min(SR, 32). Set >= SR for exact reference-cap semantics;
    # rays with more than this many valid samples drop the tail.
    ray_slot_budget: int = 0
    # Fast-path lax.map chunk (slots per gather+knn+decode chunk).
    # 0 -> 8192. SMALL chunks win on v5e (4-8k: working set near VMEM,
    # finer tail-skip quantization; 65k chunks were ~1.45x slower).
    fast_chunk: int = 0
    # Two-level sample masking (fast path): test window CENTERS (every
    # `coarse_step` samples) against an extra-dilated occupancy, keep
    # the first coarse_win_budget positive windows per ray, and run the
    # per-sample qslot lookup only on the [R, BW*coarse_step] expanded
    # window domain. The [R, D] table gather is the largest stage of
    # the step (~7.8 ns/row, purely row-issue-bound on v5e) — this
    # trades it for [R, D/S] + [R, BW*S] rows. 0 = off.
    # The coarse test is conservative (dilation covers the whole
    # window) and the fine test re-checks every sample, so results are
    # exact ONLY while per-ray positive-window counts stay within
    # coarse_win_budget: like ray_slot_budget, it is a hard layout cap
    # that tail-drops true positive windows (and their shading
    # samples) when exceeded. FastRenderOutput.win_overflow counts the
    # dropped windows per batch — nonzero means raise the budget.
    coarse_step: int = 0
    # Per-ray positive-window layout cap for the coarse pass.
    coarse_win_budget: int = 12
    # Per-ray depth-window clip (fast path): restrict the per-sample
    # qslot lookup to a contiguous window of `depth_window` samples
    # starting at the ray's slab-test entry into the grid bounding box.
    # The qslot table is nonzero only inside the grid box, so any
    # sample outside the box tests invalid anyway — clipping is EXACT
    # whenever the window covers the ray's in-box sample span
    # (FastRenderOutput.dw_overflow counts samples a too-small window
    # dropped; size via ops/raygen.suggest_depth_window, which bounds
    # the span by the box diagonal). The [R, D] table gather is the
    # single largest stage of the step (~7 ns/row, row-issue-bound on
    # v5e; stage:qs probe 88.7 of 183 ms at bench scale) and this
    # trades it for [R, depth_window] rows. 0 = off; -1 = auto (the
    # evaluator sizes it with suggest_depth_window's chord bound).
    depth_window: int = 0
    # Ray packing (fast path): process only rays whose chord intersects
    # the grid bounding box (the slab test — pure math, no gathers).
    # The first `ray_budget` box-hitting rays pack to a dense [RB]
    # prefix; the whole front-end ([RB, Dax] table gather, mask/top-k/
    # pack machinery) and the compacted-slot budget M shrink with it,
    # and per-ray outputs scatter back to [R] at the end. Rays that
    # miss the box render exact background in either path, so results
    # are EXACT while the budget covers the batch's box-hitting rays
    # (FastRenderOutput.rb_overflow counts dropped hit rays; size from
    # the frame's measured hit count — at NeRF-Synthetic chair
    # geometry ~50-60% of an 800x800 frame misses the box). 0 = off.
    ray_budget: int = 0
    # Span-TIERED ray packing (fast path; supersedes the single
    # ray_budget + depth_window pair when non-empty): box-hitting rays
    # are assigned to the smallest tier whose width covers their
    # in-box sample span, each tier packs its rays to a dense prefix
    # and renders with depth_window = that tier's width, and per-ray
    # outputs scatter back. Front-end gather rows drop from
    # RB * max_span to sum_i RB_i * w_i (chair 800x800 frame measured:
    # 0.66x at widths (64, 128, 192) vs the flat measured window; the
    # jagged ideal is 0.48x). EXACT while each tier's budget covers
    # its ray count (rb_overflow sums tier overflows) and the LAST
    # width covers the frame's max span (the last tier's dw_overflow
    # counts violations — both verified on device like dw/rb).
    # span_tiers: ascending window widths; span_tier_budgets: same
    # length, per-tier static ray budgets. Size both from a known ray
    # set via models/fast_render.measured_span_tiers.
    span_tiers: Tuple[int, ...] = ()
    span_tier_budgets: Tuple[int, ...] = ()
    # Unused since the window-expanded redesign (kept for config
    # compatibility; the old batch-average window compaction is gone).
    coarse_win_global: int = 4
    # Distance-field ray-march front-end (ops/march.py; supersedes
    # depth_window when non-empty, composes with ray_budget): rays
    # sphere-trace the packed qslot+distance table, emitting occupied
    # samples directly — tested rows ~= steps taken instead of
    # [R, D(W)] dense rows. march_steps = per-stage fuel; after each
    # stage the still-active rays repack into the next static bucket
    # (march_buckets, one entry per stage after the first). EXACT
    # while every ray finishes within the staged fuel/buckets
    # (FastRenderOutput.mc_overflow counts unfinished rays; nonzero =
    # raise the budgets, samples may be missing). Dense-grid topk
    # compaction only; needs max_q < 2^22 - 1 and z_depth_dim <= 512.
    march_steps: Tuple[int, ...] = ()
    march_buckets: Tuple[int, ...] = ()
    # Fast-path slot-compaction mechanism:
    #   "onehot" — per-ray one-hot MXU einsums + four scalar scatters
    #              (the r1 design);
    #   "topk"   — lax.top_k over sample columns + ONE scatter of a
    #              combined (ray*Dax + col) id, with [M]-row gathers
    #              recovering qslot/d/slot. Same selection semantics
    #              (first min(SR, BP) valid samples per ray).
    # The compact-skip ablation showed the compaction machinery at
    # ~129ms of the 209ms bench step; "topk" measured 188.7 vs 209.5ms
    # end-to-end and bit-exact vs "onehot" on the chip — default.
    compact_mode: str = "topk"
    # How the topk compaction finds each ray's first-BP valid sample
    # columns: "topk" = lax.top_k over masked negative column ids (a
    # full per-row sort); "pallas" = ops/select.py row-compaction
    # kernel (one lower-tri MXU matmul for prefix ranks + BP masked
    # lane-reduces, single VMEM pass — TPU only, falls back to topk
    # elsewhere). Outputs are identical.
    select_mode: str = "topk"
    # Final compositing domain (fast path, topk compaction only):
    #   "grid"   — scatter per-slot sigma/rgb/z back to [R, BP] slot
    #              rows (four [M]-row scatters), composite on the grid
    #   "packed" — composite directly on the [M] compacted axis:
    #              segmented scans (cummax z / cumprod transmittance /
    #              add for the blend sums) restart at ray boundaries,
    #              and per-ray results come from one [R]-row gather —
    #              NO scatters. Same math; f32 sums can differ in the
    #              last bits (different reduction tree).
    # Default "packed": 183.1 vs 193.5 ms at bench scale and verified
    # bit-identical on chip (check_variant_exact tkpc: 0 rays differ).
    # Non-topk compaction modes ignore this and composite on the grid.
    composite_mode: str = "packed"
    # K-NN payload extraction inside the decode chunk:
    #   "onehot" — one bf16 one-hot einsum [Mc,K,C]x[Mc,C,PAYW]
    #              (single nonzero per output keeps bf16 bits exact)
    #   "gather" — take_along_axis row gather (same values)
    #   "krows"  — restructures the whole chunk front half: gather a
    #              SLIM (meta + rel-xyz) per-candidate view for the
    #              d2/mask/shell/top_k selection, then gather only the
    #              K selected payload rows directly from the flat
    #              [max_q*C] fat-cache view — ~4x fewer gather bytes
    #              and no extract einsum at all. Bit-identical values
    #              (same selection keys, same payload bits).
    extract_mode: str = "onehot"
    # Candidate distance/masking/shell/K-select/extract stages:
    #   "xla"   — separate XLA ops (each [Mc, CAND, ·] intermediate
    #             round-trips HBM)
    #   "fused" — ONE Pallas pass over the gathered candidate block
    #             (ops/fused_select.py; kernel-facing cache layout,
    #             identical selection semantics). TPU only; interpret
    #             mode elsewhere is for tests.
    knn_mode: str = "xla"
    # The whole post-gather chunk pipeline (candidate select + extract
    # + dists + aggregation weights + radiance decode):
    #   "xla"   — staged XLA ops (chunk_pipeline stages; every
    #             [Mc, CAND, ·] / [Mc, K, ·] intermediate round-trips
    #             HBM — measured FLAT under single-stage ablations,
    #             ~274 ns/slot, PERF.md r3c)
    #   "fused" — ONE Pallas VMEM pass per block consuming the
    #             XLA-gathered candidate block (ops/fused_chunk.py).
    #             Masks match the XLA path exactly; sigma/rgb to bf16
    #             rounding tolerance (split-matmul accumulation
    #             order). Falls back to "xla" when the aggregator
    #             config is outside fused_chunk_eligible.
    chunk_mode: str = "xla"
    # Pallas block (slots per grid step) for chunk_mode="fused".
    fused_chunk_block: int = 512
    # Per-point base-layer cache (eval fast path): precompute
    # [emb, PE(emb)] @ W1_emb into an [N, hidden] bf16 table at scene
    # build (models/aggregator.precompute_base_h) and gather it per
    # selected neighbor, instead of encoding + multiplying the
    # embedding per padded (slot, K) pair. Eval frames evaluate ~4M
    # pairs per 65k-ray dispatch vs ~0.5M points in the scene, so this
    # removes ~7x of the PE(emb) transcendentals and layer-1 GEMM rows
    # (284 -> 60 per pair) at the cost of one [M, K]-row 512 B gather.
    # Colors deviate at bf16 partial-sum tolerance (the cached product
    # rounds once). Requires chunk_mode/knn_mode "xla", order >= 1,
    # and params passed to make_fast_scene. Eval-only: the train path
    # keeps the fused concat (per-step per-point precompute would
    # exceed the per-pair work it replaces at 4096-ray batches).
    base_cache: bool = False
    # MLP-tower chunk over compacted shading points (lax.map). Bounds
    # activation memory AND works around a TPU backend register-
    # allocation failure on >=512k-row decode programs (observed on
    # v5e, tools/probe_knn_decode.py). 0 = unchunked.
    decode_chunk: int = 131_072
    # Two-phase chunk pipeline (0 = off): phase A runs the candidate
    # stages (gather/geometry/K-NN/extract) at `fast_chunk` rows —
    # bounded by the [Mc, CAND] intermediates — and materializes the
    # compact [M, K] selection; phase B then decodes in chunks of
    # THIS many rows, so the MLP tower's GEMMs batch 8-64x wider than
    # the front half's VMEM limit allows. Same math, different
    # batching (tests assert bit-parity); priced by
    # tools/probe_decode_scaling.py before adoption.
    decode_chunk2: int = 0
    # Decode-tail layout (fast eval path, chunk_mode/knn_mode "xla"):
    #   "lanes" — the per-neighbor MLP tower runs on all [Mc, K]
    #             padded lanes (decode_radiance); simple, but at chair
    #             statistics ~60-70% of the tower GEMM rows are
    #             padding (mean valid K ~2.5-3 of 8).
    #   "pair"  — valid (slot, k) pairs pack to a dense
    #             [Mc * pair_budget] prefix right after the K-NN
    #             select: the payload extract becomes one [MP]-row
    #             gather from the already-loaded candidate block (no
    #             one-hot einsum), the per-neighbor tower (mlp_base +
    #             mlp_head + density) runs only on real pairs, and
    #             per-slot aggregation comes back via segment-sums —
    #             the TPU form of the reference's masked_select
    #             compaction (studio_model.py:310-315). Exact while
    #             pb_overflow == 0; f32 aggregation sums differ from
    #             the lane layout in the last bits (different
    #             reduction tree). Requires agg_intrp_order >= 1,
    #             global Rw2c, fused modes off.
    decode_mode: str = "lanes"
    # Average valid neighbors per compacted slot the pair packing is
    # provisioned for (MP = Mc * pair_budget). Overflowing pairs are
    # dropped deterministically and counted in pb_overflow; >= K can
    # never overflow (and emits no counter). 0 -> K.
    pair_budget: int = 4

    @property
    def scaled_vsize(self) -> Tuple[float, float, float]:
        return tuple(v * s for v, s in zip(self.vsize, self.vscale))

    @property
    def radius_limit(self) -> float:
        return self.radius_limit_scale * max(self.vsize[0], self.vsize[1])


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    """Radiance decoder (MLP tower) hyperparameters.

    Mirrors the reference studio model's head/width/encoding settings
    (pointnerf/nerfstudio/studio_model.py:67-113,169-237).
    """
    num_pos_freqs: int = 10
    num_viewdir_freqs: int = 4
    num_feat_freqs: int = 3
    num_dist_freqs: int = 5
    agg_dist_pers: int = 20
    # Aggregation order (reference point_aggregators.py:605-660):
    # 0 = aggregate embeddings over K before one per-slot MLP (no dist
    #     features; requires point_color_mode/point_dir_mode off),
    # 1 = per-K MLP, aggregate features, then density+color per slot,
    # 2 = per-K density (weighted-summed) + aggregated-feature color.
    agg_intrp_order: int = 2
    point_features_dim: int = 32
    point_color_mode: bool = True
    point_dir_mode: bool = True
    num_mlp_base_layers: int = 2
    num_mlp_head_layers: int = 2
    num_color_layers: int = 3
    hidden_size: int = 256
    hidden_size_color: int = 128
    axis_weight: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    act_super: bool = False
    # Compute dtype of the MLP tower (params stay float32).
    compute_dtype: str = "float32"
    # Positional-encoding evaluation for the hot per-(slot, K)
    # encodings (PE(dists), PE(emb)) in decode_radiance: "direct"
    # evaluates sin/cos at every octave; "rec" seeds one sin/cos pair
    # and derives the higher octaves via angle-doubling multiplies
    # (ops/encoding.py) — within ~2e-4 of direct at F<=12, i.e. under
    # bf16 tower rounding. Per-slot encodings (viewdirs) stay direct.
    pe_mode: str = "direct"
    # Opt-in: the fused Pallas decode kernel (ops/fused_decode.py) for
    # rendering on TPU. Measured SLOWER than the XLA decoder on v5e
    # (86 vs 51 ms per 262k slots, tools/probe_knn_decode.py) — XLA's
    # fusion already keeps this workload near its HBM bound — so it is
    # off by default and kept as a parity-tested experiment.
    fused_decode: bool = False
    # Opt-in: the K-accumulating Pallas decode (ops/fused_decode.py
    # fused_decode2) in the FAST render path: K-reduction inside the
    # kernel (8x less output traffic than the r1 kernel), concat-free
    # matmuls. Measured against the XLA decoder per scene before use.
    fused_decode2: bool = False
    # Aggregation weight kernel (reference `agg_distance_kernel`,
    # point_aggregators.py:353-483): linear | numlinear | quadric |
    # numquadric | avg | trilinear | sh_intrp | gau_intrp | feat_intrp.
    agg_distance_kernel: str = "linear"
    # Normalize weights over K (skipped for trilinear / num* kernels,
    # which normalize internally — point_aggregators.py:818-819).
    agg_weight_norm: bool = True
    # sh_intrp: SH bands (consumes sh_degree**2 embedding channels),
    # coefficient activation, and radial falloff.
    sh_degree: int = 4
    sh_act: str = "sigmoid"            # sigmoid | tanh
    sh_dist_func: str = "sh_linear"    # sh_linear | sh_quadric
    # feat_intrp: learned aggregation weights — sigmoid(MLP([PE(world
    # delta, weight_xyz_freq), emb[..., :weight_feat_dim]])). The
    # reference declares this MLP's architecture in init only
    # (point_aggregators.py:226-237: two halving Linear+act layers +
    # Linear(1)+Sigmoid over 2*weight_xyz_freq*3 + weight_feat_dim
    # inputs, consuming weight_feat_dim embedding channels per the
    # in_channels bookkeeping at :277) and never wires a forward
    # branch; this is the implied forward.
    weight_xyz_freq: int = 2
    weight_feat_dim: int = 8
    # Legacy aggregator folds the confidence straight-through clamp into
    # the aggregation weight (point_aggregators.py:826-829); the studio
    # model only regularizes conf in the loss (studio_model.py:288-292).
    conf_in_weight: bool = False

    @property
    def dist_dim(self) -> int:
        if self.agg_dist_pers > 9:
            return 4 if self.agg_dist_pers == 30 else 6
        return 3

    @property
    def shading_feature_dim(self) -> int:
        """Embedding channels reaching the MLP tower after the weight
        kernel consumes its prefix (sh coefs / gaussian footprint)."""
        if self.agg_distance_kernel == "sh_intrp":
            return self.point_features_dim - self.sh_degree ** 2
        if self.agg_distance_kernel == "gau_intrp":
            return self.point_features_dim - 7
        if self.agg_distance_kernel == "feat_intrp":
            return self.point_features_dim - self.weight_feat_dim
        return self.point_features_dim


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference: studio_config.py:33-48)."""
    lr_fields: float = 5e-4
    lr_points: float = 2e-3
    lr_decay_exp: float = 0.1
    lr_decay_iters: int = 1_000_000
    # Alternate which optimizer steps every `alter_step` iterations
    # (0 = both every step): fields update while (step//alter_step)%2
    # == 0, point attributes while == 1 (reference backward,
    # neural_points_volumetric_model.py:204-211).
    alter_step: int = 0
    max_iterations: int = 200_000
    rays_per_batch: int = 4096
    # Train through the fast differentiable path (models/fast_train.py:
    # geometry cache + one-hot compaction + chunk skipping; ~2x the
    # legacy step on v5e). Loss trajectory matches the legacy path on a
    # fixed seed (tests/test_fast_train.py); prob-mode probing and
    # per-point-Rw2c scenes still use the legacy path.
    fast_path: bool = False
    # Pixel-sampling mode (reference --random_sample,
    # nerf_synth360_ft_dataset.py:589-618): "random" (integer pixels),
    # "random2" (continuous uniform coords; gt indexed by floor),
    # "patch" (one contiguous sqrt(rays_per_batch)^2 patch),
    # "no_crop" (the full image grid).
    random_sample: str = "random"
    # Sample the ray batch ON DEVICE inside the jitted step (mode
    # "random", single-host loop): images/poses upload once and each
    # step is ONE dispatch with zero host->device argument transfers —
    # on a remote-tunnel backend the per-step uploads otherwise
    # dominate the step. Same sampling distribution as PixelSampler
    # (different RNG stream). Other modes / mesh runs use the host
    # sampler regardless.
    device_sampling: bool = True
    # Optimizer steps folded into ONE dispatch (lax.scan) in the
    # device-sampling path: K steps amortize the per-call dispatch
    # latency (~5 ms on a remote-tunnel backend — a large fraction of
    # a ~20-50 ms step). Semantically exact: the scan replays the same
    # per-step PRNG split sequence as K single dispatches, so the
    # trajectory is bit-identical (tests/test_train_loop.py).
    # Print/prune/grow/save/eval cadences fire at the first dispatch
    # boundary at-or-after their step (granularity K-1 late at most).
    steps_per_dispatch: int = 1
    zero_epsilon: float = 1e-3
    zero_one_loss_weight: float = 1e-4
    jitter: float = 0.3
    # Rematerialization of the fast train step's per-chunk decode
    # (models/fast_train.py). Autodiff through the chunked tower saves
    # every activation ([Mc, K, 284] concat, 4x 256-wide layers, PE
    # intermediates — ~200 MB/chunk at 4096-ray batches) as backward
    # residuals; that HBM round-trip is a large share of the ~23 ms
    # backward. Gradients are EXACT under every mode:
    #   "none"      — plain autodiff (all residuals saved)
    #   "selection" — save only the K-NN selection outputs
    #                 (pnt_mask/pidx/nxyz, tagged via checkpoint_name)
    #                 and recompute the MLP tower in the backward; the
    #                 [Mc, CAND] candidate stages never re-run
    #   "full"      — jax.checkpoint with no policy (recompute
    #                 everything incl. the top_k selection)
    # CHIP-MEASURED (r4b): both modes LOSE on v5e at chair scale
    # (53.1 / 54+ ms vs 43.6 plain) — the recompute costs more than
    # the residual round-trip. Kept for memory-bound configs.
    remat: str = "none"
    # Auto-plan the jitter-aware distance-field march for the fast
    # train path (fit() sizes march_steps/march_buckets from the
    # scene's cameras; chip-measured 43.6 -> 40.8 ms/step at chair
    # scale, bit-exact while the logged mc_overflow aux stays 0).
    # Off by default: point GROWTH adds occupancy mid-run and can push
    # the walk past the pre-planned fuel (the counter reports it, but
    # the affected steps would train on dropped samples).
    march_auto: bool = False
    # Loss registry (reference: base_rendering_model.py:533-663,
    # options color_loss_items/depth_loss_items/bg_loss_items/
    # sparse_loss_weight). Color items: "coarse_raycolor" (plain MSE),
    # "ray_masked_<name>" (MSE over rays that hit occupied space),
    # "ray_miss_<name>" (MSE over missed rays, scaled by miss count).
    color_loss_items: Tuple[str, ...] = ("ray_masked_coarse_raycolor",)
    color_loss_weights: Tuple[float, ...] = (1.0,)
    depth_loss_weight: float = 0.0
    bg_loss_weight: float = 0.0
    sparse_loss_weight: float = 0.0
    # prune/grow (reference: run/train_ft.py:829-923)
    prune_iter: int = 0           # 0 disables
    prune_thresh: float = 0.1
    prune_max_iter: int = 100_000
    prob_freq: int = 0            # 0 disables point growing
    prob_num_step: int = 100
    prob_thresh: float = 0.8
    prob_mul: float = 1.0         # conf multiplier for grown points


@dataclasses.dataclass(frozen=True)
class PointNerfConfig:
    """Top-level model config."""
    query: QueryConfig = dataclasses.field(default_factory=QueryConfig)
    agg: AggregatorConfig = dataclasses.field(default_factory=AggregatorConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    path_point_cloud: Optional[str] = None
    # Raw sample placement along rays (reference `opt.inverse` selects
    # disparity-linear sampling, point_query.py:78-81).
    inverse: bool = False
    num_samples: int = 80
    eval_num_rays_per_chunk: int = 4096
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Scene near/far planes (dev_scripts --near_plane/--far_plane);
    # datasets may override per view.
    near_plane: float = 2.0
    far_plane: float = 6.0
    # Background model: "no" (constant bg_color) or "plane"
    # (models/bg_plane.py; reference --bgmodel). Plane geometry/color
    # are scene-level data the reference datasets supply per batch
    # (mvs_utils.gen_bg_points reads batch["plane_pnt"/"plane_normal"],
    # set_bg takes data["plane_color"]).
    bgmodel: str = "no"
    bg_plane_pnt: tuple = (0.0, 0.0, 0.0)
    bg_plane_normal: tuple = (0.0, 0.0, 1.0)
    bg_plane_color: tuple = (1.0, 1.0, 1.0)
    # Compositing plug-ins (reference diff_render_func.py:16-33):
    # blend "alpha" | "alpha2" (collocated light), tonemap
    # "off" | "gamma" | "normalize".
    blend_func: str = "alpha"
    tonemap_func: str = "off"
    feat_grad: bool = True
    conf_grad: bool = True
    dir_grad: bool = True
    color_grad: bool = True

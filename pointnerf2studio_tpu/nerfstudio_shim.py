"""`ns-train pointnerf-original` surface (optional nerfstudio shim).

The reference registers its method through the
`nerfstudio.method_configs` entry point (reference: pyproject.toml:24-25
-> pointnerf/nerfstudio/studio_config.py:52-54) and carries all model
hyperparameters in a studio `PointNerfConfig`
(pointnerf/nerfstudio/studio_model.py:61-118). This module preserves
that surface for the TPU rebuild:

* `studio_to_tpu_config` — pure mapping from the studio config's field
  names/values onto the TPU `PointNerfConfig` tree (works without
  nerfstudio installed; unit-tested).
* `pointnerf_original` — a lazily-built `MethodSpecification` (resolved
  only when nerfstudio imports the entry point). Its pipeline renders
  through the JAX fast path and steps the JAX trainer inside
  `get_train_loss_dict`, so `ns-train pointnerf-original
  --pipeline.model.path-point-cloud <ckpt>` trains the same checkpoint
  format as the native CLI. torch optimizers see one dummy parameter
  (the real optimization is the two optax Adam groups,
  train/trainer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from pointnerf2studio_tpu.config import (AggregatorConfig, PointNerfConfig,
                                         QueryConfig, TrainConfig)

# Studio-config field names (studio_model.py:61-118) -> where they live
# in the TPU config tree.
_QUERY_FIELDS = ("vsize", "vscale", "kernel_size", "query_size", "ranges",
                 "z_depth_dim", "SR", "K", "max_o", "P", "NN")
_AGG_FIELDS = ("num_pos_freqs", "num_viewdir_freqs", "num_feat_freqs",
               "num_dist_freqs", "agg_dist_pers", "point_features_dim",
               "point_color_mode", "point_dir_mode",
               "num_mlp_base_layers", "num_mlp_head_layers",
               "num_color_layers", "hidden_size", "hidden_size_color")
_INT_TUPLE_FIELDS = {"vscale", "kernel_size", "query_size"}


def studio_to_tpu_config(
    path_point_cloud: Optional[str] = None,
    eval_num_rays_per_chunk: int = 4096,
    num_samples: int = 80,
    zero_epsilon: float = 1e-3,
    zero_one_loss_weights: float = 1e-4,
    **studio_fields: Any,
) -> PointNerfConfig:
    """Map the reference studio `PointNerfConfig` fields onto the TPU
    config tree. Unknown fields raise (typo protection, mirroring
    tyro's strictness)."""
    qkw, akw = {}, {}
    for name, val in studio_fields.items():
        if name in _QUERY_FIELDS:
            if isinstance(val, (list, tuple)):
                conv = int if name in _INT_TUPLE_FIELDS else float
                val = tuple(conv(v) for v in val)
            qkw[name] = val
        elif name in _AGG_FIELDS:
            akw[name] = val
        else:
            raise TypeError(f"unknown studio config field: {name!r}")
    train = TrainConfig(zero_epsilon=zero_epsilon,
                        zero_one_loss_weight=zero_one_loss_weights)
    return PointNerfConfig(
        query=QueryConfig(**qkw),
        agg=AggregatorConfig(**akw),
        train=train,
        path_point_cloud=(str(path_point_cloud)
                          if path_point_cloud is not None else None),
        num_samples=num_samples,
        eval_num_rays_per_chunk=eval_num_rays_per_chunk,
    )


def _build_method_spec():
    """Construct the MethodSpecification (requires nerfstudio)."""
    import numpy as np
    import torch
    from nerfstudio.configs.base_config import ViewerConfig
    from nerfstudio.data.datamanagers.base_datamanager import (
        VanillaDataManager, VanillaDataManagerConfig)
    from nerfstudio.engine.optimizers import AdamOptimizerConfig
    from nerfstudio.engine.schedulers import ExponentialDecaySchedulerConfig
    from nerfstudio.engine.trainer import TrainerConfig
    from nerfstudio.models.base_model import Model, ModelConfig
    from nerfstudio.pipelines.base_pipeline import (VanillaPipeline,
                                                    VanillaPipelineConfig)
    from nerfstudio.plugins.types import MethodSpecification

    @dataclasses.dataclass
    class PointNerfTPUModelConfig(ModelConfig):
        _target: Any = dataclasses.field(
            default_factory=lambda: PointNerfTPUModel)
        path_point_cloud: Optional[str] = None
        eval_num_rays_per_chunk: int = 2304

    class PointNerfTPUModel(Model):
        """nerfstudio Model facade over the JAX render/train stack.

        Holds the JAX TrainState; get_outputs renders through
        models/render.py (numpy bridge). One dummy torch parameter
        keeps nerfstudio's optimizer machinery satisfied — the real
        updates happen in the optax step driven by the pipeline.
        """
        config: PointNerfTPUModelConfig

        def populate_modules(self):
            super().populate_modules()
            import jax.numpy as jnp

            from pointnerf2studio_tpu.ops.grid import build_grid_from_points
            from pointnerf2studio_tpu.train.trainer import (
                create_train_state, make_train_step)
            from pointnerf2studio_tpu.utils import checkpoint_io as cio

            if self.config.path_point_cloud is None:
                raise RuntimeError(
                    "--pipeline.model.path-point-cloud is required "
                    "(a *_net_ray_marching.pth checkpoint)")
            self.tpu_cfg = studio_to_tpu_config(
                path_point_cloud=self.config.path_point_cloud)
            params, points = cio.load_reference_checkpoint(
                self.config.path_point_cloud)
            self.tpu_state = create_train_state(params, points,
                                                self.tpu_cfg)
            self.tpu_grid = build_grid_from_points(
                points.xyz, points.alive, self.tpu_cfg.query)
            self.tpu_step = make_train_step(self.tpu_cfg)
            self._jnp = jnp
            self._step_count = 0
            # keeps get_param_groups non-empty for the Trainer
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def get_param_groups(self):
            return {"fields": [self.dummy]}

        def _render_np(self, campos, camrot, raydirs, near, far):
            from pointnerf2studio_tpu.models.render import render_rays_jit
            jnp = self._jnp
            out = render_rays_jit(
                self.tpu_state.params, self.tpu_state.points,
                self.tpu_grid, jnp.asarray(campos), jnp.asarray(camrot),
                jnp.asarray(raydirs), jnp.asarray(near),
                jnp.asarray(far), self.tpu_cfg)
            return (np.asarray(out.coarse_raycolor),
                    np.asarray(out.acc), np.asarray(out.depth))

        def get_outputs(self, ray_bundle):
            origins = ray_bundle.origins.reshape(-1, 3)
            dirs = ray_bundle.directions.reshape(-1, 3)
            campos = origins[0].detach().cpu().numpy()
            camrot = ray_bundle.metadata.get("camrotc2w")
            if camrot is None:
                camrot = np.eye(3, dtype=np.float32)
            else:
                camrot = camrot.reshape(3, 3).detach().cpu().numpy()
            near = float(ray_bundle.nears.min()) if ray_bundle.nears is not None \
                else self.tpu_cfg.near_plane
            far = float(ray_bundle.fars.max()) if ray_bundle.fars is not None \
                else self.tpu_cfg.far_plane
            rgb, acc, depth = self._render_np(
                campos, camrot, dirs.detach().cpu().numpy(), near, far)
            dev = ray_bundle.origins.device
            return {
                "rgb": torch.from_numpy(rgb).to(dev),
                "accumulation": torch.from_numpy(acc).to(dev)[..., None],
                "depth": torch.from_numpy(depth).to(dev)[..., None],
            }

        def train_step_jax(self, campos, camrot, raydirs, gt_rgb,
                           near, far, seed: int):
            """One optax step (called by the pipeline); returns losses."""
            import jax
            jnp = self._jnp
            self.tpu_state, aux = self.tpu_step(
                self.tpu_state, self.tpu_grid, jnp.asarray(campos),
                jnp.asarray(camrot), jnp.asarray(raydirs),
                jnp.asarray(gt_rgb), jnp.asarray(near, jnp.float32),
                jnp.asarray(far, jnp.float32), jax.random.PRNGKey(seed))
            return {k: float(v) for k, v in aux.items()}

        def get_loss_dict(self, outputs, batch, metrics_dict=None):
            gt = batch["image"].to(outputs["rgb"].device)
            mse = torch.mean((outputs["rgb"] - gt) ** 2)
            # keep torch graph non-empty (dummy contributes 0)
            return {"rgb_loss": mse + self.dummy.sum() * 0.0}

        def get_metrics_dict(self, outputs, batch):
            gt = batch["image"].to(outputs["rgb"].device)
            mse = torch.mean((outputs["rgb"] - gt) ** 2)
            return {"psnr": -10.0 * torch.log10(mse.clamp_min(1e-12))}

        def get_image_metrics_and_images(self, outputs, batch):
            m = self.get_metrics_dict(outputs, batch)
            return ({k: float(v) for k, v in m.items()},
                    {"img": outputs["rgb"]})

    class PointNerfTPUPipeline(VanillaPipeline):
        """Steps the JAX trainer from within nerfstudio's train loop."""

        def get_train_loss_dict(self, step: int):
            ray_bundle, batch = self.datamanager.next_train(step)
            model = self.model
            origins = ray_bundle.origins.reshape(-1, 3)
            campos = origins[0].detach().cpu().numpy()
            camrot = ray_bundle.metadata.get("camrotc2w")
            camrot = (camrot.reshape(3, 3).detach().cpu().numpy()
                      if camrot is not None else None)
            import numpy as _np
            if camrot is None:
                camrot = _np.eye(3, dtype=_np.float32)
            dirs = ray_bundle.directions.reshape(-1, 3)
            near = float(ray_bundle.nears.min()) \
                if ray_bundle.nears is not None else model.tpu_cfg.near_plane
            far = float(ray_bundle.fars.max()) \
                if ray_bundle.fars is not None else model.tpu_cfg.far_plane
            aux = model.train_step_jax(
                campos, camrot, dirs.detach().cpu().numpy(),
                batch["image"].reshape(-1, 3).detach().cpu().numpy(),
                near, far, seed=step)
            import torch as _t
            # loss is reported (already applied by the optax step); the
            # dummy-parameter term gives torch a valid zero-grad graph
            loss_dict = {"rgb_loss": _t.tensor(aux.get("total", 0.0))
                         + model.dummy.sum() * 0.0}
            metrics = {k: _t.tensor(v) for k, v in aux.items()}
            return {}, loss_dict, metrics

    trainer = TrainerConfig(
        method_name="pointnerf-original",
        experiment_name="pointnerf2studio_tpu",
        pipeline=VanillaPipelineConfig(
            _target=PointNerfTPUPipeline,
            datamanager=VanillaDataManagerConfig(
                _target=VanillaDataManager,
                train_num_rays_per_batch=4096,
                eval_num_rays_per_batch=4096,
            ),
            model=PointNerfTPUModelConfig(eval_num_rays_per_chunk=2304),
        ),
        max_num_iterations=200_000,
        steps_per_save=25_000,
        steps_per_eval_batch=1_000,
        steps_per_eval_image=2_000,
        steps_per_eval_all_images=100_000,
        optimizers={
            "fields": {
                "optimizer": AdamOptimizerConfig(lr=5e-4),
                "scheduler": ExponentialDecaySchedulerConfig(
                    lr_final=5e-5, max_steps=1_000_000),
            },
        },
        viewer=ViewerConfig(num_rays_per_chunk=1 << 12),
        vis="viewer",
    )
    return MethodSpecification(
        config=trainer,
        description="TPU-native (JAX) Point-NeRF; trains via optax "
                    "inside the pipeline, renders via the JAX path.")


def __getattr__(name: str):
    if name == "pointnerf_original":
        try:
            return _build_method_spec()
        except ImportError as e:
            raise ImportError(
                "ns-train integration needs the `studio` extra "
                "(pip install pointnerf2studio_tpu[studio])") from e
    raise AttributeError(name)

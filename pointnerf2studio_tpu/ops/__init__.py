from pointnerf2studio_tpu.ops.encoding import positional_encoding
from pointnerf2studio_tpu.ops.raygen import near_far_linear_ray_generation
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.compositing import (
    alpha_composite,
    ray_dist_from_sample_z,
)

from pointnerf2studio_tpu.parallel.sharding import (
    make_mesh, make_sharded_train_step, make_sharded_render, ray_sharding)

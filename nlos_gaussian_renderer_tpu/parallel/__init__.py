from nlos_gaussian_renderer_tpu.parallel.mesh import make_mesh
from nlos_gaussian_renderer_tpu.parallel.sharding import (
    make_sharded_train_step,
    shard_scene,
)

__all__ = ["make_mesh", "make_sharded_train_step", "shard_scene"]

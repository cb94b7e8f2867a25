from yolo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, model_axis_size, replicated_sharding,
    shard_batch, state_sharding_tree)

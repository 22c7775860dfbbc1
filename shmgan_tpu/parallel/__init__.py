from shmgan_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_train_state, batch_sharding, param_shardings,
)

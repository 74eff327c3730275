from icee_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    decoder_param_shardings,
    shard_pytree,
)

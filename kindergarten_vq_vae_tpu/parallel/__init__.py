from kindergarten_vq_vae_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    shard_batch,
    batch_spec,
)

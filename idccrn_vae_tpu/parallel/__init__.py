from idccrn_vae_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)

from spef_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    data_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

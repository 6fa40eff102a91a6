from inverse_audio_synthesis_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
    shard_batch,
)

from mmbidaf_tpu.parallel.sp_lstm import make_sp_bilstm  # noqa: F401
from mmbidaf_tpu.parallel.sp_tower import make_sp_audio_tower  # noqa: F401
from mmbidaf_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    local_batch_rows,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_frontend,
    shard_params,
)

"""Parallelism layer: device meshes and sharding rules.

The reference is strictly single-device (SURVEY.md §2.6); this layer is the
TPU-native addition prescribed by BASELINE.json: data-parallel pjit over a
``Mesh(('data',))`` with XLA-inserted collectives, per-host dataset sharding,
and ZeRO-1-style sharded optimizer state via ``NamedSharding``.
"""

from genomics_lm_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    local_device_count,
)
from genomics_lm_tpu.parallel.pipeline import (  # noqa: F401
    PIPE_AXIS,
    make_pipeline_train_step,
    merge_stage_params,
    pipeline_loss,
    split_stage_params,
    stage_param_sharding,
)
from genomics_lm_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    opt_state_sharding,
    replicated,
    tp_param_sharding,
    zero1_opt_state_sharding,
)

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    spatial_sharding,
    make_mesh,
    pad_to_multiple,
    param_shardings,
    replicate,
    replicated,
    shard_batch,
)
from .pp import pipeline_blocks, stack_shardings
from .pp_model import Unit, build_model_pipeline, partition_units
from .tp import mscan_tp_rules, resolve_tp_rules, shard_variables
from .distributed import (
    initialize_distributed,
    is_main_process,
    local_device_count,
    process_count,
)

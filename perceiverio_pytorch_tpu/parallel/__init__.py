from perceiverio_pytorch_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    default_mesh_shape,
    make_mesh,
)
from perceiverio_pytorch_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    fsdp_param_partition_spec,
    param_partition_spec,
    replicated,
    shard_variables,
    variables_shardings,
)
from perceiverio_pytorch_tpu.parallel.api import (  # noqa: F401
    make_data_parallel_apply,
    pad_batch_to_multiple,
)
from perceiverio_pytorch_tpu.parallel.sequence_parallel import (  # noqa: F401
    sequence_parallel_attention,
)
from perceiverio_pytorch_tpu.parallel.pipeline import (  # noqa: F401
    PIPE_AXIS,
    make_pipeline_mesh,
    pipeline_spmd,
    pipelined_self_attends,
    pp_param_shardings,
    stack_layer_params,
    unstack_layer_params,
    unstack_layer_params_circular,
)
from perceiverio_pytorch_tpu.parallel.multihost import (  # noqa: F401
    initialize_distributed,
    is_multihost,
    local_batch_size,
    shard_host_batch,
    sync_hosts,
)

from perceiverio_pytorch_tpu.training.losses import (  # noqa: F401
    classification_cross_entropy,
    flow_endpoint_error,
    masked_token_cross_entropy,
    multimodal_autoencode_loss,
)
from perceiverio_pytorch_tpu.training.trainer import (  # noqa: F401
    TrainState,
    create_sharded_train_state,
    create_train_state,
    make_multi_step,
    make_sharded_train_step,
    make_train_step,
    opt_state_shardings,
    param_shardings,
)
from perceiverio_pytorch_tpu.training.loop import (  # noqa: F401
    MetricsLogger,
    Trainer,
)
from perceiverio_pytorch_tpu.training.optim import (  # noqa: F401
    build_optimizer,
    build_schedule,
    non_1d_weight_decay_mask,
)
from perceiverio_pytorch_tpu.training.data import (  # noqa: F401
    batch_iterator,
    prefetch_to_device,
)
from perceiverio_pytorch_tpu.training.datasets import (  # noqa: F401
    FlowPairDataset,
    ImageFolderDataset,
    MLMDataset,
    Subset,
    TextFileDataset,
    VideoClipDataset,
    dataset_iterator,
)
from perceiverio_pytorch_tpu.training.lora import (  # noqa: F401
    init_lora,
    lora_paths,
    merge_lora,
    wrap_loss,
)

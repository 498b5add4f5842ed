"""perceiverio_pytorch_tpu: a TPU-native JAX/Pallas Perceiver IO framework.

A from-scratch re-design of the capability surface of
JOBR0/PerceiverIO_Pytorch (mounted read-only at /root/reference) for TPU:
jitted end-to-end apply, Pallas flash kernels for the long-sequence
cross-attention sites, bf16+fp32-softmax dtype policy, and pjit/shard_map
device-mesh parallelism -- plus a checkpoint adapter for the converted
DeepMind PyTorch weights.
"""

__version__ = "0.1.0"

from perceiverio_pytorch_tpu.config import (  # noqa: F401
    DEFAULT,
    PARITY,
    PERFORMANCE,
    PERFORMANCE_INT8,
    PERFORMANCE_INT8_STATIC,
    Policy,
)
from perceiverio_pytorch_tpu.core.attention import (  # noqa: F401
    Attention,
    CrossAttention,
    MLP,
    SelfAttention,
    make_cross_attention_mask,
)
from perceiverio_pytorch_tpu.core.position_encoding import (  # noqa: F401
    FourierPositionEncoding,
    PosEncodingType,
    PositionEncodingProjector,
    TrainablePositionEncoding,
    build_linear_positions,
    build_position_encoding,
    generate_fourier_features,
)
from perceiverio_pytorch_tpu.core.perceiver import (  # noqa: F401
    MultimodalPreprocessor,
    PerceiverDecoder,
    PerceiverEncoder,
    PerceiverIO,
    restructure,
)
from perceiverio_pytorch_tpu.core.queries import (  # noqa: F401
    BasicQuery,
    FlowQuery,
    FourierQuery,
    TrainableQuery,
)
from perceiverio_pytorch_tpu.serving import (  # noqa: F401
    export_apply,
    load_exported,
)
from perceiverio_pytorch_tpu.serving_server import (  # noqa: F401
    BatchingServer,
)
from perceiverio_pytorch_tpu.serving_http import (  # noqa: F401
    HttpFrontend,
)

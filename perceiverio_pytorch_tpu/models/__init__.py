from perceiverio_pytorch_tpu.models.classification import (  # noqa: F401
    ClassificationPerceiver,
    PrepType,
)
from perceiverio_pytorch_tpu.models.flow import (  # noqa: F401
    FlowInference,
    FlowPerceiver,
    compute_grid_indices,
)
from perceiverio_pytorch_tpu.models.language import LanguagePerceiver  # noqa: F401
from perceiverio_pytorch_tpu.models.multimodal import MultiModalPerceiver  # noqa: F401

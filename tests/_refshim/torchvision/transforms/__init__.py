import torch

from . import functional  # noqa: F401


class Normalize:
    """Per-channel (x - mean) / std on [..., C, H, W] tensors."""

    def __init__(self, mean, std, inplace=False):
        self.mean = mean
        self.std = std

    def __call__(self, tensor):
        mean = torch.as_tensor(self.mean, dtype=tensor.dtype,
                               device=tensor.device)
        std = torch.as_tensor(self.std, dtype=tensor.dtype,
                              device=tensor.device)
        view = [-1] + [1] * 2
        return (tensor - mean.view(view)) / std.view(view)

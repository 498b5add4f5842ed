"""Helpers for parity tests: randomise a torch reference model's weights and
convert them into our flax tree via the checkpoint adapter."""

import numpy as np


def randomize_state_dict(torch_model, seed: int = 0):
    """In-place randomisation of all floating tensors (incl. BN EMA stats)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = torch_model.state_dict()
    with torch.no_grad():
        for k, v in sd.items():
            if not v.dtype.is_floating_point:
                continue
            if "running_var" in k:
                v.copy_(torch.rand(v.shape, generator=g) + 0.5)
            else:
                v.copy_(torch.randn(v.shape, generator=g) * 0.05)
    return torch_model.state_dict()


def to_numpy(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)

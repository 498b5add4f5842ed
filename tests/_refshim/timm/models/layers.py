"""Minimal shim of the timm init helpers used by the reference repo."""
import math
import torch

def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    with torch.no_grad():
        tensor.normal_(mean, std)
        tensor.clamp_(a, b)
    return tensor

def variance_scaling_(tensor, scale=1.0, mode="fan_in", distribution="normal"):
    fan_in = tensor.shape[1] * (tensor[0][0].numel() if tensor.dim() > 2 else 1)
    fan_out = tensor.shape[0] * (tensor[0][0].numel() if tensor.dim() > 2 else 1)
    denom = {"fan_in": fan_in, "fan_out": fan_out, "fan_avg": (fan_in + fan_out) / 2}[mode]
    variance = scale / denom
    if distribution == "truncated_normal":
        trunc_normal_(tensor, std=math.sqrt(variance) / 0.87962566103423978)
    elif distribution == "normal":
        with torch.no_grad():
            tensor.normal_(std=math.sqrt(variance))
    else:
        raise ValueError(distribution)
    return tensor

def lecun_normal_(tensor):
    variance_scaling_(tensor, mode="fan_in", distribution="truncated_normal")
    return tensor

def to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)

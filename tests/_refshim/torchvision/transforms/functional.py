import torch


def resized_crop(img, top, left, height, width, size, **kwargs):
    """Crop then bilinear-resize, tensor backend (antialias as in
    torchvision>=0.17 defaults)."""
    img = img[..., top : top + height, left : left + width]
    unbatched = img.dim() == 3
    if unbatched:
        img = img[None]
    out = torch.nn.functional.interpolate(
        img.float(), size=tuple(size), mode="bilinear",
        align_corners=False, antialias=True,
    )
    return out[0] if unbatched else out

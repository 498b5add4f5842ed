"""Minimal torchvision shim for running the reference examples in-process
(torchvision is not installed in this environment).  Implements only the
two symbols /root/reference/example_img_classify.py uses -- transforms.
Normalize and transforms.functional.resized_crop -- with torch ops matching
torchvision's tensor backend (aten bilinear resize with antialias, which is
the torchvision>=0.17 default for tensor inputs)."""

from . import transforms  # noqa: F401

"""Static class-name tables (ImageNet-1k, Kinetics-700).

Stored as JSON data files (perceiverio_pytorch_tpu/data/) rather than Python
literals; capability match for /root/reference/utils/imagenet_labels.py and
utils/kinetics_700_classes.py.
"""

from __future__ import annotations

import functools
import json
import os
from typing import List

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")


@functools.lru_cache(maxsize=None)
def imagenet_labels() -> List[str]:
    with open(os.path.join(_DATA_DIR, "imagenet_labels.json")) as f:
        return json.load(f)


@functools.lru_cache(maxsize=None)
def kinetics700_labels() -> List[str]:
    with open(os.path.join(_DATA_DIR, "kinetics700_labels.json")) as f:
        return json.load(f)

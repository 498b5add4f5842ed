"""Device-mesh construction for SPMD execution.

The reference is strictly single-device (SURVEY.md 2.3: no DP/TP/PP of any
kind); this framework scales via ``jax.sharding.Mesh`` + GSPMD.  Axis
convention:

  * ``data``  -- batch (data parallelism); gradients all-reduce over ICI.
  * ``model`` -- tensor parallelism over attention heads / MLP hidden, and
                 sequence parallelism over the long input-token axis of the
                 encoder cross-attend (the Perceiver's inputs are its only
                 long axis -- latents are small, so TP+SP share one axis).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh.

    Args:
      shape: (data, model) sizes.  Defaults to all devices on the data axis.
      devices: devices to use (default: jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    d, m = shape
    if d * m != len(devices):
        raise ValueError(f"mesh shape {shape} != device count {len(devices)}")
    mesh_devices = np.asarray(devices).reshape(d, m)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def default_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """Pick a (data, model) factorisation: model=2 when even and >=4 devices
    (exercises TP collectives), else pure DP."""
    if n_devices >= 4 and n_devices % 2 == 0:
        return (n_devices // 2, 2)
    return (n_devices, 1)

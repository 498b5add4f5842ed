"""Native checkpoint save/restore via Orbax.

The reference only loads converted .pth files (example_language.py:36-41);
this module provides the framework's own format (Orbax: async, sharded,
resumable) plus round-tripping of the TrainState.  Reading the reference's
.pth files lives in utils.torch_checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from perceiverio_pytorch_tpu.training.trainer import TrainState


def save_variables(path: str, variables: Any) -> None:
    """Save a flax variables pytree to ``path`` (an empty/new directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, variables)


def restore_variables(path: str, template: Optional[Any] = None) -> Any:
    """Restore a variables pytree; ``template`` provides structure/shardings."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def save_train_state(path: str, state: TrainState) -> None:
    save_variables(path, {"step": state.step, "params": state.params, "opt_state": state.opt_state})


def restore_train_state(path: str, template: TrainState) -> TrainState:
    restored = restore_variables(
        path,
        {"step": template.step, "params": template.params, "opt_state": template.opt_state},
    )
    return TrainState(
        step=restored["step"], params=restored["params"], opt_state=restored["opt_state"]
    )

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
import jax.numpy as jnp
import orbax.checkpoint as ocp

from perceiverio_pytorch_tpu.training.trainer import TrainState


def _is_zero_size(x) -> bool:
    return hasattr(x, "size") and x.size == 0


def _mask_zero_size(tree):
    """Swap zero-size leaves for 1-element placeholders (orbax cannot
    serialise empty arrays).

    Zero-width parameters are legitimate in this model family: e.g. the
    decoder query padding embedding is [1, 0] when a modality's query already
    has the common width (perceiver.py:262-270).
    """
    return jax.tree_util.tree_map(
        lambda x: jnp.zeros((1,), jnp.float32) if _is_zero_size(x) else x, tree
    )


_ZERO_META = "zero_size_leaves.json"


def _path_keys(path) -> list:
    keys = []
    for k in path:
        if hasattr(k, "key"):
            keys.append(k.key)
        elif hasattr(k, "idx"):
            keys.append(k.idx)
        else:  # GetAttrKey etc. -- not produced by variables/state trees
            keys.append(str(k))
    return keys


def save_variables(path: str, variables: Any) -> None:
    """Save a flax variables pytree to ``path`` (an empty/new directory).

    Zero-size leaves are masked for orbax (see _mask_zero_size) and their
    true shapes recorded in a sidecar JSON, so a template-free restore can
    reconstruct them exactly (a serving process has no model code to build
    a template from).
    """
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _mask_zero_size(variables))
    import json

    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    zero = [
        {"path": _path_keys(p), "shape": list(x.shape), "dtype": str(x.dtype)}
        for p, x in flat
        if _is_zero_size(x)
    ]
    if zero:
        with open(os.path.join(path, _ZERO_META), "w") as f:
            json.dump(zero, f)


def _unmask_from_sidecar(path: str, restored: Any) -> Any:
    """Replace masked placeholders with their true zero-size arrays."""
    import json

    meta_path = os.path.join(path, _ZERO_META)
    if not os.path.exists(meta_path):
        return restored
    with open(meta_path) as f:
        entries = json.load(f)
    for entry in entries:
        node = restored
        for k in entry["path"][:-1]:
            node = node[k]
        node[entry["path"][-1]] = jnp.zeros(
            tuple(entry["shape"]), jnp.dtype(entry["dtype"])
        )
    return restored


def restore_variables(path: str, template: Optional[Any] = None) -> Any:
    """Restore a variables pytree; ``template`` provides structure/shardings
    and re-materialises any zero-size leaves masked at save time.  Without a
    template, the orbax-native nested-dict layout is returned and zero-size
    leaves are reconstructed from the save-time sidecar."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, _mask_zero_size(template)
            )
            restored = ckptr.restore(path, abstract)
            return jax.tree_util.tree_map(
                lambda t, r: jnp.zeros(t.shape, t.dtype)
                if _is_zero_size(t)
                else r,
                template,
                restored,
            )
        return _unmask_from_sidecar(path, ckptr.restore(path))


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Path of the highest-step ``step_XXXXXXXX`` checkpoint, or None.

    Matches the layout Trainer writes (one orbax directory per periodic
    save); incomplete saves (no orbax metadata inside) are skipped so a
    crash mid-save resumes from the previous good checkpoint.
    """
    if not os.path.isdir(checkpoint_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(checkpoint_dir):
        if not name.startswith("step_"):
            continue
        try:
            step = int(name[len("step_"):])
        except ValueError:
            continue
        full = os.path.join(checkpoint_dir, name)
        if not os.path.isdir(full) or not os.listdir(full):
            continue
        if step > best_step:
            best, best_step = full, step
    return best


def save_train_state(path: str, state: TrainState) -> None:
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.model_state is not None:
        tree["model_state"] = state.model_state
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    save_variables(path, tree)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    tree = {
        "step": template.step,
        "params": template.params,
        "opt_state": template.opt_state,
    }
    if template.model_state is not None:
        tree["model_state"] = template.model_state
    if template.ema_params is not None:
        tree["ema_params"] = template.ema_params
    if template.model_state is None:
        # The restore is template-driven, so a checkpoint that carries
        # model_state (e.g. BatchNorm batch_stats) would be silently
        # dropped -- resuming with freshly-initialised statistics.  Detect
        # from the checkpoint's tree metadata and refuse instead.
        has_model_state = False
        try:
            import json

            meta_path = os.path.join(os.path.abspath(path), "_METADATA")
            with open(meta_path) as f:
                tree_meta = json.load(f).get("tree_metadata", {})
            has_model_state = any(
                entry.get("key_metadata")
                and entry["key_metadata"][0].get("key") == "model_state"
                for entry in tree_meta.values()
            )
        except Exception:
            pass  # metadata layout unknown -> keep the legacy behaviour
        if has_model_state:
            raise ValueError(
                f"checkpoint at {path} contains 'model_state' (e.g. BatchNorm"
                " batch_stats) but the restore template has model_state=None;"
                " build the template with create_train_state(...,"
                " model_state=aux) so it is restored rather than dropped."
            )
    restored = restore_variables(path, tree)
    return TrainState(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        model_state=restored.get("model_state"),
        ema_params=restored.get("ema_params"),
    )

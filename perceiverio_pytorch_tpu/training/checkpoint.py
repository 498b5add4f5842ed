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


def _zero_entries(variables) -> list:
    """Sidecar records for zero-size leaves (see _mask_zero_size)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    return [
        {"path": _path_keys(p), "shape": list(x.shape), "dtype": str(x.dtype)}
        for p, x in flat
        if _is_zero_size(x)
    ]


def _write_sidecar(path: str, zero: list) -> None:
    # one writer for the host-side sidecar (N processes racing the same
    # file on shared storage can interleave to garbled JSON)
    if not zero or jax.process_index() != 0:
        return
    import json

    with open(os.path.join(path, _ZERO_META), "w") as f:
        json.dump(zero, f)


def _clear_for_overwrite(path: str) -> None:
    # one process clears the shared directory; the rest wait for it
    # (N concurrent rmtrees of the same tree race to FileNotFoundError)
    if jax.process_index() == 0:
        import shutil

        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_overwrite:{path}")


def save_variables(path: str, variables: Any, overwrite: bool = False) -> None:
    """Save a flax variables pytree to ``path`` (an empty/new directory).

    Zero-size leaves are masked for orbax (see _mask_zero_size) and their
    true shapes recorded in a sidecar JSON, so a template-free restore can
    reconstruct them exactly (a serving process has no model code to build
    a template from).

    ``overwrite``: replace an existing checkpoint at ``path`` (orbax
    refuses by default) -- used by the Trainer's periodic saves so a
    resumed run can re-save a step it reaches again.
    """
    path = os.path.abspath(path)
    if overwrite and os.path.isdir(path):
        _clear_for_overwrite(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _mask_zero_size(variables))
    _write_sidecar(path, _zero_entries(variables))


class AsyncCheckpointWriter:
    """Background checkpoint saves: training keeps stepping while the
    previous state writes to disk.

    ``save`` snapshots device arrays synchronously (orbax copies to host
    before returning) and streams the disk write in a background thread;
    a following donated train step therefore cannot corrupt the save.  At
    most one save is in flight -- a new ``save`` first waits for the
    previous one, and the zero-size sidecar (see save_variables) is written
    at finalisation.  ``latest_checkpoint`` already ignores unfinalised
    saves, so a crash mid-background-write resumes from the previous good
    checkpoint.  Multihost: orbax's async save is itself collective; the
    sidecar stays process-0-only.

    Use as a context manager or call ``close()`` so the last save
    finalises before the process exits.
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._sidecar_thread = None

    def save(self, path: str, variables: Any, overwrite: bool = False) -> None:
        self.wait()  # one save in flight; also joins the prior sidecar write
        path = os.path.abspath(path)
        if overwrite and os.path.isdir(path):
            _clear_for_overwrite(path)
        self._ckptr.save(
            path, args=ocp.args.StandardSave(_mask_zero_size(variables))
        )
        zero = _zero_entries(variables)
        if zero:
            # Chase orbax's background finalisation and write the sidecar
            # IMMEDIATELY after it, not at the next wait(): otherwise a
            # hard crash (SIGKILL/OOM) between finalisation and the next
            # save leaves a checkpoint that latest_checkpoint() accepts but
            # whose template-free restore would silently return masked
            # placeholders for the zero-size leaves.
            import threading

            def _finalize():
                self._ckptr.wait_until_finished()
                _write_sidecar(path, zero)

            self._sidecar_thread = threading.Thread(
                target=_finalize, daemon=True
            )
            self._sidecar_thread.start()

    def save_train_state(
        self, path: str, state: TrainState, overwrite: bool = False
    ) -> None:
        self.save(path, _train_state_tree(state), overwrite=overwrite)

    def wait(self) -> None:
        """Block until the in-flight save (if any) is finalised on disk,
        sidecar included."""
        self._ckptr.wait_until_finished()
        if self._sidecar_thread is not None:
            self._sidecar_thread.join()
            self._sidecar_thread = None

    def close(self) -> None:
        self.wait()
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _unmask_from_sidecar(path: str, restored: Any) -> Any:
    """Replace masked placeholders with their true zero-size arrays."""
    import json

    meta_path = os.path.join(path, _ZERO_META)
    if not os.path.exists(meta_path):
        return restored
    with open(meta_path) as f:
        entries = json.load(f)

    def _child(node, k):
        # Sequence positions (e.g. optax tuple state) are ints in the
        # sidecar but string keys in orbax's template-free dict layout.
        if isinstance(node, (list, tuple)):
            return node[int(k)]
        if isinstance(k, int) and k not in node:
            return node[str(k)]
        # namedtuple fields (optax ScaleByAdamState.mu etc.) are recorded
        # as ".mu" by the save-time keypath formatting, but orbax's
        # template-free layout uses the bare field name
        if isinstance(k, str) and k.startswith(".") and k not in node:
            return node[k[1:]]
        return node[k]

    for entry in entries:
        node = restored
        for k in entry["path"][:-1]:
            node = _child(node, k)
        last = entry["path"][-1]
        if isinstance(node, list):
            last = int(last)
        elif isinstance(last, int) and last not in node:
            last = str(last)
        elif isinstance(last, str) and last.startswith(".") and last not in node:
            last = last[1:]
        node[last] = jnp.zeros(
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


def restore_eval_variables(
    variables, checkpoint: Optional[str] = None,
    torch_checkpoint: Optional[str] = None,
):
    """Load weights into an initialised variables tree for evaluation.

    ``checkpoint`` is an orbax directory -- either a raw variables tree or a
    Trainer checkpoint (TrainState layout).  Trainer checkpoints prefer the
    EMA params when present and merge the non-param collections riding in
    ``model_state`` (batch_stats, quant_stats).  ``torch_checkpoint`` is a
    reference-convention ``.pth`` (``{"model_state_dict": ...}``,
    /root/reference/example_language.py:36-41) mapped through the
    name/layout adapter.  With neither, ``variables`` is returned unchanged.
    """
    if checkpoint:
        tree = restore_variables(checkpoint)  # template-free (sidecar-aware)
        if isinstance(tree, dict) and "step" in tree and "params" in tree:
            params = tree.get("ema_params") or tree["params"]
            extra = tree.get("model_state") or {}
            if isinstance(params, dict) and "params" in params:
                # TrainState.params held the FULL variables dict (the MLM
                # demo trains directly on model.init's output); splicing it
                # under another "params" key would double-nest.  Merge its
                # collections instead.
                return {**variables, **params, **extra}
            return {**variables, "params": params, **extra}
        return restore_variables(checkpoint, variables)
    if torch_checkpoint:
        from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        variables, _ = convert_state_dict(
            load_torch_checkpoint(torch_checkpoint), variables
        )
    return variables


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Path of the highest-step ``step_XXXXXXXX`` checkpoint, or None.

    Matches the layout Trainer writes (one orbax directory per periodic
    save); incomplete saves (no finalized orbax metadata inside) are
    skipped so a crash mid-save resumes from the previous good checkpoint.
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
        # _CHECKPOINT_METADATA is written at orbax finalization; its absence
        # means the save never completed.
        if not os.path.isdir(full) or not os.path.exists(
            os.path.join(full, "_CHECKPOINT_METADATA")
        ):
            continue
        if step > best_step:
            best, best_step = full, step
    return best


def prune_checkpoints(checkpoint_dir: str, keep: int) -> list:
    """Delete all but the newest ``keep`` finalized step checkpoints.

    Long runs otherwise accumulate a full TrainState (params + optimizer
    moments + EMA) every ``checkpoint_every`` steps.  Unfinalized leftovers
    (crash mid-save) OLDER than the newest finalized checkpoint are also
    removed -- they can never be resumed from and will never be reached and
    overwritten again.  Returns the removed paths.
    """
    if keep <= 0:
        raise ValueError(f"keep must be positive; got {keep}")
    if not os.path.isdir(checkpoint_dir):
        return []
    finalized, unfinalized = [], []
    for name in os.listdir(checkpoint_dir):
        if not name.startswith("step_"):
            continue
        try:
            step = int(name[len("step_"):])
        except ValueError:
            continue
        full = os.path.join(checkpoint_dir, name)
        if not os.path.isdir(full):
            continue
        if os.path.exists(os.path.join(full, "_CHECKPOINT_METADATA")):
            finalized.append((step, full))
        else:
            unfinalized.append((step, full))
    finalized.sort()
    doomed = [p for _, p in finalized[:-keep]] if len(finalized) > keep else []
    if finalized:
        newest = finalized[-1][0]
        doomed += [p for s, p in unfinalized if s < newest]
    import shutil

    for path in doomed:
        shutil.rmtree(path)
    return doomed


def _checkpoint_top_keys(path: str) -> Optional[set]:
    """Top-level tree keys recorded in the checkpoint's orbax metadata, or
    None when the metadata layout is unknown (legacy behaviour: no check)."""
    try:
        import json

        with open(os.path.join(os.path.abspath(path), "_METADATA")) as f:
            tree_meta = json.load(f).get("tree_metadata", {})
        keys = set()
        for entry in tree_meta.values():
            km = entry.get("key_metadata")
            if km:
                keys.add(km[0].get("key"))
        return keys or None
    except Exception:
        return None


def _train_state_tree(state: TrainState) -> dict:
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.model_state is not None:
        tree["model_state"] = state.model_state
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    return tree


def save_train_state(path: str, state: TrainState, overwrite: bool = False) -> None:
    save_variables(path, _train_state_tree(state), overwrite=overwrite)


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

    # The restore is template-driven, so optional parts present in the
    # checkpoint but absent from the template (model_state, ema_params)
    # would be silently dropped -- resuming with fresh BatchNorm statistics
    # or irrecoverably losing the averaged weights at the next periodic
    # save.  Detect the mismatch from the checkpoint's tree metadata and
    # refuse instead (both directions).
    ckpt_keys = _checkpoint_top_keys(path)
    if ckpt_keys is not None:
        if template.model_state is None and "model_state" in ckpt_keys:
            raise ValueError(
                f"checkpoint at {path} contains 'model_state' (e.g. BatchNorm"
                " batch_stats) but the restore template has model_state=None;"
                " build the template with create_train_state(...,"
                " model_state=aux) so it is restored rather than dropped."
            )
        if template.ema_params is None and "ema_params" in ckpt_keys:
            raise ValueError(
                f"checkpoint at {path} contains 'ema_params' but the restore"
                " template has ema_params=None; build the template with"
                " create_train_state(..., ema_decay=...) so the averaged"
                " weights are restored rather than dropped."
            )
        if template.ema_params is not None and "ema_params" not in ckpt_keys:
            raise ValueError(
                f"the restore template expects 'ema_params' but the checkpoint"
                f" at {path} has none (it was saved without ema_decay);"
                " restore with an EMA-free template and re-seed the EMA from"
                " the restored params if you want to enable it mid-run."
            )
    restored = restore_variables(path, tree)
    return TrainState(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        model_state=restored.get("model_state"),
        ema_params=restored.get("ema_params"),
    )

"""Adapter: converted-DeepMind PyTorch checkpoints -> flax variable pytrees.

The reference ships converted Haiku->PyTorch checkpoints loaded as
``torch.load(path)["model_state_dict"]`` (e.g.
/root/reference/example_language.py:36-41); the conversion conventions are
codified in /root/reference/utils/utils.py:143-180 (Linear stores w.T,
LayerNorm scale/offset as weight/bias, Conv w.T.swapaxes(-1,-2), BatchNorm
EMA state, Embedding table as-is).  This adapter inverts those conventions
back into flax layout:

  leaf transforms (keyed on the flax leaf name):
    kernel (2-D)  <- weight.T                (torch Linear [out,in])
    kernel (4-D)  <- weight.transpose(2,3,1,0)  (torch Conv [out,in,kh,kw])
    scale         <- weight                  (LayerNorm / BatchNorm)
    embedding     <- weight                  (Embedding, same layout)
    mean / var    <- running_mean / running_var (batch_stats collection)

  path translation: the flax module tree mirrors the reference's attribute
  names minus PyTorch-isms (leading underscores, ModuleDict dots); see
  ``_translate_path``.

Works directly on a live ``state_dict()`` too, which is how the parity tests
oracle against the PyTorch reference with random weights.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

try:  # torch is only needed for .pth loading / test oracles, not inference
    import torch
except ImportError:  # pragma: no cover
    torch = None

from flax.traverse_util import flatten_dict, unflatten_dict

# flax attribute segment -> torch attribute segment
_SIMPLE_SEGMENTS = {
    "encoder": "_encoder",
    "decoder": "_decoder",
    "multi_preprocessor": "_multi_preprocessor",
    "position_enc": "_position_encoding",
    "positional_encoding": "_positional_encoding",
    "projector": "_projector",
    "base_position_encoding": "_base_position_encoding",
    "conv_after_patch_layer": "_conv_after_patch_layer",
    "extra_pos_mlp": "_extra_pos_mlps",
    "embedding": "_embedding",  # EmbeddingPostprocessor's shared table attr
}

# flax container-field prefix -> torch ModuleDict attribute
_CONTAINER_PREFIXES = {
    "input_preprocessors": "_multi_preprocessor._preprocessors",
    "output_postprocessors": "_output_postprocessors",
    "output_queries": "_output_queries",
    "padding_embeddings": "padding_embeddings",
    "mask_tokens": "mask_tokens",
}

_INDEXED_RE = re.compile(r"^(convs|norms|linear)_(\d+)$")


def _translate_segment(seg: str) -> str:
    m = _INDEXED_RE.match(seg)
    if m:
        name, idx = m.groups()
        if name == "linear":  # _ExtraPosMLP layers: linear_i -> i
            return idx
        return f"{name}.{idx}"
    for prefix, torch_name in _CONTAINER_PREFIXES.items():
        if seg == prefix:
            # bare container field = single ("__default") modality
            return f"{torch_name}.__default"
        if seg.startswith(prefix + "_"):
            modality = seg[len(prefix) + 1 :]
            return f"{torch_name}.{modality}"
    return _SIMPLE_SEGMENTS.get(seg, seg)


def _translate_path(path, collection: str) -> str:
    """flax ('perceiver','encoder',..,'kernel') -> torch dotted name."""
    *body, leaf = path
    segments = [_translate_segment(s) for s in body]
    if collection == "batch_stats":
        leaf_name = {"mean": "running_mean", "var": "running_var"}[leaf]
    else:
        leaf_name = {
            "kernel": "weight",
            "scale": "weight",
            "embedding": "weight",
        }.get(leaf, leaf)
    return ".".join(segments + [leaf_name])


def _transform_value(leaf: str, value: np.ndarray, target_shape) -> np.ndarray:
    if leaf == "kernel":
        if value.ndim == 2:
            value = value.T
        elif value.ndim == 4:
            value = value.transpose(2, 3, 1, 0)
        else:
            raise ValueError(f"Unexpected kernel rank {value.ndim}")
    if tuple(value.shape) != tuple(target_shape):
        raise ValueError(
            f"Shape mismatch for {leaf}: torch {value.shape} vs flax"
            f" {tuple(target_shape)}"
        )
    return value


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if torch is not None and isinstance(v, torch.Tensor):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def convert_state_dict(
    state_dict: Mapping[str, Any],
    variables_template,
    overrides: Optional[Mapping[str, str]] = None,
    dtype=jnp.float32,
):
    """Fill a flax variables template from a torch state_dict.

    Args:
      state_dict: torch name -> tensor/ndarray.
      variables_template: flax variables (e.g. from ``model.init``) providing
        the tree structure and shapes.
      overrides: flax 'a/b/c' path -> torch dotted name, for model-specific
        placements (e.g. the tied language embedding living at the task-model
        top level).

    Returns:
      (variables, unused_torch_keys)
    """
    state_dict = state_dict_to_numpy(state_dict)
    overrides = dict(overrides or {})
    used = set()
    new_vars = {}
    for collection, tree in variables_template.items():
        if collection not in ("params", "batch_stats"):
            # Derived buffers (e.g. the "consts" Fourier tables) are pure
            # functions of the model config with no torch counterpart; keep
            # the template's values.  They must therefore be CONCRETE: a
            # jax.eval_shape template would leak ShapeDtypeStructs into the
            # returned variables and fail only later, inside apply.
            for path, leaf in flatten_dict(tree).items():
                if not hasattr(leaf, "__array__"):
                    raise TypeError(
                        f"variables_template[{collection!r}]"
                        f"[{'/'.join(path)}] is abstract"
                        f" ({type(leaf).__name__}); the {collection!r}"
                        " collection is copied from the template, so build"
                        " it with a real (jitted) model.init, not"
                        " jax.eval_shape."
                    )
            new_vars[collection] = tree
            continue
        flat = flatten_dict(tree)
        new_flat = {}
        for path, template_value in flat.items():
            flax_key = "/".join(path)
            if flax_key in overrides:
                torch_key = overrides[flax_key]
            else:
                torch_key = _translate_path(path, collection)
            if torch_key not in state_dict:
                raise KeyError(
                    f"flax param {flax_key} -> torch key {torch_key!r} not in"
                    " state_dict"
                )
            value = _transform_value(
                path[-1], state_dict[torch_key], template_value.shape
            )
            used.add(torch_key)
            new_flat[path] = jnp.asarray(value, dtype)
        new_vars[collection] = unflatten_dict(new_flat)
    unused = [k for k in state_dict if k not in used and "num_batches_tracked" not in k]
    return new_vars, unused


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference-convention .pth checkpoint as numpy arrays."""
    if torch is None:
        raise ImportError("torch is required to read .pth checkpoints")
    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in checkpoint:
        checkpoint = checkpoint["model_state_dict"]
    return state_dict_to_numpy(checkpoint)


def export_state_dict(
    variables,
    overrides: Optional[Mapping[str, str]] = None,
    tied: Optional[Mapping[str, str]] = None,
) -> Dict[str, np.ndarray]:
    """Inverse adapter: flax variables -> reference-convention state_dict.

    Lets fine-tuned weights be saved in the format the PyTorch reference
    loads (``{"model_state_dict": ...}`` after torch.save).  ``tied`` maps
    extra torch keys to already-exported torch keys (e.g. the language
    model's postprocessor embedding alias).
    """
    overrides = dict(overrides or {})
    out: Dict[str, np.ndarray] = {}
    for collection, tree in variables.items():
        if collection not in ("params", "batch_stats"):
            continue  # derived buffers ("consts") have no torch counterpart
        for path, value in flatten_dict(tree).items():
            flax_key = "/".join(path)
            torch_key = overrides.get(flax_key) or _translate_path(
                path, collection
            )
            value = np.asarray(value, np.float32)
            leaf = path[-1]
            if leaf == "kernel":
                if value.ndim == 2:
                    value = value.T
                elif value.ndim == 4:
                    value = value.transpose(3, 2, 0, 1)
            out[torch_key] = value
    for alias, source in (tied or {}).items():
        out[alias] = out[source]
    return out


def save_torch_checkpoint(path: str, variables, overrides=None, tied=None):
    """Write a reference-loadable ``.pth`` with a model_state_dict entry."""
    if torch is None:
        raise ImportError("torch is required to write .pth checkpoints")
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_state_dict(variables, overrides, tied).items()
    }
    torch.save({"model_state_dict": sd}, path)


# Model-specific overrides ------------------------------------------------

# LanguagePerceiver: the tied token embedding lives at the task-model top
# level in flax (shared module), while torch stores it (twice) inside the
# pre/postprocessors.
LANGUAGE_OVERRIDES = {
    "embed/embedding": "perceiver._multi_preprocessor._preprocessors.__default.embed.weight",
}

# torch stores the tied table a second time under the postprocessor.
LANGUAGE_TIED = {
    "perceiver._output_postprocessors.__default._embedding.weight": (
        "perceiver._multi_preprocessor._preprocessors.__default.embed.weight"
    ),
}

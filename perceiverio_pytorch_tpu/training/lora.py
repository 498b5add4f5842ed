"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

The reference ships four pretrained checkpoints and no training code
(SURVEY.md section 4; /root/reference/README.md:38-41) -- the natural
production follow-on is adapting those weights to a downstream task.
Full fine-tuning of e.g. the shipped language model drags ~201M params of
Adam state through HBM every step; LoRA (Hu et al., 2021) instead trains a
rank-r delta ``(alpha/r) * A @ B`` on each attention/MLP projection kernel
and freezes everything else.

TPU-native angle:
  * The trainable tree is tiny, so the optimizer state is tiny -- the HBM
    budget is the frozen forward/backward, not Adam moments, which lets a
    full-scale model fine-tune on one chip where full FT would OOM
    (see utils/memory.hbm_headroom to check).
  * The base params enter the jitted step as constants-by-argument: they
    are never donated or updated, so XLA keeps one resident copy.
  * ``A @ B`` is recomputed inside the step (rank is small; two skinny
    GEMMs fuse into the surrounding update) -- nothing is materialised at
    full kernel size except the add into the frozen kernel.

Everything composes with the existing machinery because the LoRA tree IS
the TrainState params: ``wrap_loss`` closes over the frozen base params
and the standard step builders / Trainer / EMA / orbax checkpointing /
sharding treat the adapter tree like any other params pytree.

Typical flow::

    base = load_torch_checkpoint(...)            # frozen, pretrained
    lora = init_lora(jax.random.PRNGKey(0), base["params"], rank=8)
    loss = wrap_loss(loss_fn, base["params"])    # loss(lora, *batch)
    trainer = Trainer(loss, optax.adamw(1e-4))
    state = trainer.init_state(lora)
    state = trainer.fit(state, batches, num_steps=...)
    merged = merge_lora(base["params"], state.params)   # deploy / export
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# Param names of the modules whose 2-D "kernel" gets an adapter by default:
# the attention projections and the MLP (core/attention.py mirrors the
# reference's transformer_primitives.py:73-88 naming).
DEFAULT_TARGETS = ("proj_q", "proj_k", "proj_v", "final", "fc1", "fc2")


def _names(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        out.append(str(getattr(p, "key", getattr(p, "name", p))))
    return tuple(out)


def _set(nested: dict, names: Sequence[str], value) -> None:
    d = nested
    for n in names[:-1]:
        d = d.setdefault(n, {})
    d[names[-1]] = value


def default_match(names: Tuple[str, ...], leaf) -> bool:
    """True for 2-D ``kernel`` leaves owned by an attention/MLP projection."""
    return (
        len(names) >= 2
        and names[-1] == "kernel"
        and names[-2] in DEFAULT_TARGETS
        and getattr(leaf, "ndim", 0) == 2
    )


def init_lora(
    rng: jax.Array,
    params: Any,
    rank: int,
    *,
    targets: Optional[Sequence[str]] = None,
    match: Optional[Callable[[Tuple[str, ...], Any], bool]] = None,
    dtype: Any = None,
) -> dict:
    """Build the adapter tree for ``params``.

    Returns a nested dict mirroring ``params`` where every selected kernel
    leaf is replaced by ``{"a": [in, rank], "b": [rank, out]}``; unselected
    leaves are absent.  ``b`` is zero-initialised so the merged model is
    EXACTLY the base model at step 0; ``a`` is lecun-normal.

    Args:
      targets: parent-module param names to adapt (default
        ``DEFAULT_TARGETS``: all attention projections + MLP).
      match: full override -- ``match(path_names, leaf) -> bool``; wins over
        ``targets``.
      dtype: adapter dtype (default: each kernel's own dtype).
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    if match is None:
        allowed = tuple(targets) if targets is not None else DEFAULT_TARGETS

        def match(names, leaf):  # noqa: F811 - deliberate default binding
            return (
                len(names) >= 2
                and names[-1] == "kernel"
                and names[-2] in allowed
                and getattr(leaf, "ndim", 0) == 2
            )

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    selected = [(_names(p), leaf) for p, leaf in flat]
    selected = [(n, l) for n, l in selected if match(n, l)]
    if not selected:
        raise ValueError(
            "init_lora matched no kernels; check targets/match against the"
            " param tree (expected 2-D 'kernel' leaves under one of"
            f" {list(targets) if targets is not None else list(DEFAULT_TARGETS)})"
        )
    lora: dict = {}
    keys = jax.random.split(rng, len(selected))
    for k, (names, kernel) in zip(keys, selected):
        d_in, d_out = kernel.shape
        adtype = dtype if dtype is not None else kernel.dtype
        a = (jax.random.normal(k, (d_in, rank)) / math.sqrt(d_in)).astype(adtype)
        b = jnp.zeros((rank, d_out), adtype)
        _set(lora, names, {"a": a, "b": b})
    return lora


def lora_paths(lora: Any) -> list:
    """Slash-joined kernel paths carrying an adapter (sorted)."""
    flat = jax.tree_util.tree_flatten_with_path(lora)[0]
    return sorted({"/".join(_names(p)[:-1]) for p, _ in flat})


def _adapter_index(lora: Any) -> dict:
    idx: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(lora)[0]:
        names = _names(path)
        if names[-1] not in ("a", "b"):
            raise ValueError(f"not a LoRA tree: unexpected leaf at {names}")
        idx.setdefault(names[:-1], {})[names[-1]] = leaf
    return idx


def merge_lora(params: Any, lora: Any, *, alpha: Optional[float] = None) -> Any:
    """Return ``params`` with ``kernel += (alpha/rank) * a @ b`` applied.

    ``alpha`` defaults to the rank (unit scale, the common convention), so
    a freshly initialised adapter (``b == 0``) merges to the base params
    bit-exactly.  Jit-safe: called inside the training step by
    ``wrap_loss``, where the two skinny GEMMs fuse into the step.
    """
    idx = _adapter_index(lora)
    seen = set()

    def _merge(path, leaf):
        names = _names(path)
        ab = idx.get(names)
        if ab is None:
            return leaf
        seen.add(names)
        rank = ab["a"].shape[1]
        scale = (alpha if alpha is not None else float(rank)) / float(rank)
        delta = (ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)) * scale
        return leaf + delta.astype(leaf.dtype)

    merged = jax.tree_util.tree_map_with_path(_merge, params)
    missing = set(idx) - seen
    if missing:
        raise ValueError(
            "adapter paths absent from params:"
            f" {sorted('/'.join(m) for m in missing)}"
        )
    return merged


def wrap_loss(
    loss_fn: Callable[..., Any],
    base_params: Any,
    *,
    alpha: Optional[float] = None,
    with_model_state: bool = False,
) -> Callable[..., Any]:
    """Lift ``loss_fn(params, *batch)`` to ``loss(lora, *batch)``.

    The returned callable merges the (frozen, closed-over) base params with
    the adapter tree and evaluates ``loss_fn`` on the result, so gradients
    flow only into the adapters.  Drop-in for make_train_step / Trainer with
    the LoRA tree as the TrainState params.  With ``with_model_state=True``
    the lifted signature is ``loss(lora, model_state, *batch)`` matching the
    step builders' model-state contract.
    """
    if with_model_state:

        def lifted(lora, model_state, *batch):
            return loss_fn(merge_lora(base_params, lora, alpha=alpha),
                           model_state, *batch)

    else:

        def lifted(lora, *batch):
            return loss_fn(merge_lora(base_params, lora, alpha=alpha), *batch)

    return lifted

"""Optimizer construction: LR schedules, clipping, gradient accumulation.

The reference is inference-only (SURVEY.md 4); this wires the standard
production training knobs around optax so Trainer users don't hand-compose
the chain each time.  Everything returned here is a plain optax
GradientTransformation and composes with the sharded train-step builders
(trainer.py) unchanged -- GSPMD propagates param shardings into the
accumulator/moment tensors.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax
import optax


def non_1d_weight_decay_mask(params) -> Any:
    """Decay-mask pytree: True only for leaves with ndim >= 2.

    The standard production masking rule: weight matrices and conv kernels
    are decayed; biases, LayerNorm scales/offsets, and other vector/scalar
    leaves are not (they carry no capacity, and decaying them measurably
    hurts).  Pass as ``build_optimizer(weight_decay_mask="non_1d")``.
    """
    return jax.tree_util.tree_map(lambda p: getattr(p, "ndim", 0) >= 2, params)


def build_schedule(
    peak_lr: float,
    *,
    schedule: str = "constant",
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    end_lr_ratio: float = 0.0,
):
    """An optax schedule from a name.

    Args:
      schedule: "constant" | "cosine" | "linear" (decay to
        ``end_lr_ratio * peak_lr`` over ``total_steps``), each with an
        optional linear warmup over ``warmup_steps``.
    """
    if schedule == "constant":
        base = optax.constant_schedule(peak_lr)
    elif schedule == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule requires total_steps")
        base = optax.cosine_decay_schedule(
            peak_lr, max(total_steps - warmup_steps, 1), alpha=end_lr_ratio
        )
    elif schedule == "linear":
        if total_steps is None:
            raise ValueError("linear schedule requires total_steps")
        base = optax.linear_schedule(
            peak_lr, peak_lr * end_lr_ratio, max(total_steps - warmup_steps, 1)
        )
    else:
        raise ValueError(
            f"schedule must be 'constant', 'cosine' or 'linear'; got {schedule!r}"
        )
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, peak_lr, warmup_steps)
        return optax.join_schedules([warmup, base], [warmup_steps])
    return base


def build_optimizer(
    peak_lr: float,
    *,
    optimizer: str = "adamw",
    schedule: str = "constant",
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    end_lr_ratio: float = 0.0,
    weight_decay: float = 0.0,
    weight_decay_mask: Union[str, Callable, Any, None] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    momentum: float = 0.9,
    clip_norm: Optional[float] = None,
    accum_steps: int = 1,
    skip_nonfinite_updates: int = 0,
    trainable_mask: Union[Callable, Any, None] = None,
) -> optax.GradientTransformation:
    """A production optimizer chain with schedule, clipping, accumulation.

    Args:
      optimizer: "adamw" (default) | "adafactor" (factored second moments
        -- roughly 1x-params optimizer HBM instead of adamw's 2x, the
        standard choice for very large models on TPU) | "lion" (sign
        momentum, 1x params) | "sgd" (momentum ``momentum``).  ``b1``/``b2``
        apply to adamw and lion; ``weight_decay`` to all but sgd.
      accum_steps: micro-batches per optimizer update via optax.MultiSteps
        -- the returned transformation still consumes one micro-batch
        gradient per ``update`` call.
      skip_nonfinite_updates: > 0 guards against NaN/Inf gradients (bf16
        training spikes, bad batches): a non-finite update is dropped —
        params, moments, and schedule step untouched — unless that many
        arrive consecutively, after which the update is accepted as a real
        divergence to surface rather than mask (optax.apply_if_finite).
      trainable_mask: fine-tuning freeze filter — a bool pytree matching
        the params (or a ``params -> bool pytree`` callable); False leaves
        receive zero updates and allocate no moment state (e.g. load a
        converted checkpoint and train only the classification head).
        Frozen leaves also stay out of the clip-norm statistic.  Exception:
        ``accum_steps > 1`` wraps everything in MultiSteps, whose gradient
        accumulator spans ALL params including frozen ones (1x-params HBM).
      weight_decay_mask: which leaves ``weight_decay`` applies to.  None
        (default) decays everything; ``"non_1d"`` decays only ndim>=2
        leaves (kernels/conv filters -- skips biases and LayerNorm
        scales/offsets, the standard production rule); or any optax mask
        (a params->bool-pytree callable, or a bool pytree).  Ignored by
        ``"sgd"``.
    """
    lr = build_schedule(
        peak_lr,
        schedule=schedule,
        total_steps=total_steps,
        warmup_steps=warmup_steps,
        end_lr_ratio=end_lr_ratio,
    )
    if weight_decay_mask == "non_1d":
        mask = non_1d_weight_decay_mask
    elif isinstance(weight_decay_mask, str):
        raise ValueError(
            "weight_decay_mask must be None, 'non_1d', a callable or a"
            f" bool pytree; got {weight_decay_mask!r}"
        )
    else:
        mask = weight_decay_mask
    if optimizer == "adamw":
        core = optax.adamw(
            lr, b1=b1, b2=b2, weight_decay=weight_decay, mask=mask
        )
    elif optimizer == "adafactor":
        core = optax.adafactor(
            lr, weight_decay_rate=weight_decay or None, weight_decay_mask=mask
        )
    elif optimizer == "lion":
        core = optax.lion(
            lr, b1=b1, b2=b2, weight_decay=weight_decay, mask=mask
        )
    elif optimizer == "sgd":
        core = optax.sgd(lr, momentum=momentum)
    else:
        raise ValueError(
            "optimizer must be 'adamw', 'adafactor', 'lion' or 'sgd';"
            f" got {optimizer!r}"
        )
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(core)
    tx = optax.chain(*parts)
    if trainable_mask is not None:
        def _labels(params):
            mask = (
                trainable_mask(params)
                if callable(trainable_mask)
                else trainable_mask
            )
            return jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", mask
            )

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, _labels
        )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps).gradient_transformation()
    if skip_nonfinite_updates > 0:
        # OUTERMOST -- outside MultiSteps too: a NaN micro-batch must be
        # dropped before it poisons the accumulator (and before it could
        # advance the schedule or pollute the clip statistics); the window
        # simply accumulates one more good micro-batch instead.
        tx = optax.apply_if_finite(tx, skip_nonfinite_updates)
    return tx

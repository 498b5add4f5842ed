"""Training step builders: single-chip and mesh-sharded (pjit/GSPMD).

Design: pure-functional train state (params + optax state), one jitted step
with donated state so updates happen in-place in HBM.  On a mesh, params are
annotated with the TP rules from parallel.sharding and the batch with the
data axis; optimizer-state shardings are not hand-specified -- they fall out
of a jitted ``tx.init`` (GSPMD propagates the param shardings into the
same-shaped adam moments).  XLA inserts all collectives (gradient psum over
ICI, TP all-reduces); no hand-written communication.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from perceiverio_pytorch_tpu.parallel.sharding import batch_sharding


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # Non-differentiable model variables carried across steps (e.g. the conv
    # preprocessor's BatchNorm batch_stats).  None for purely functional
    # models.
    model_state: Any = None
    # Exponential moving average of params (None unless the state was built
    # with ema_decay); evaluate/export with these for the usual late-training
    # stability win.
    ema_params: Any = None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state, s.model_state, s.ema_params), None),
    lambda _, c: TrainState(*c),
)


def _ema_update(ema, params, decay):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
    )


def create_train_state(
    params,
    tx: optax.GradientTransformation,
    model_state: Any = None,
    ema_decay: Any = None,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # jitted: eager tx.init dispatches one XLA computation per leaf
        # (hundreds of remote-compile RPCs on this transport)
        opt_state=jax.jit(tx.init)(params),
        model_state=model_state,
        # A jitted identity forces fresh buffers (one XLA dispatch for the
        # whole tree): params and ema_params must not alias or the donated
        # step would receive the same buffer twice.
        ema_params=(
            jax.jit(lambda t: jax.tree_util.tree_map(jnp.array, t))(params)
            if ema_decay is not None
            else None
        ),
    )


def _step_body(
    state: TrainState,
    batch,
    loss_fn,
    tx,
    with_model_state: bool,
    ema_decay,
):
    """One optimizer update; shared by all three step builders."""
    if with_model_state:
        (loss, model_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.model_state, *batch)
    else:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch)
        model_state = state.model_state
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema_params = state.ema_params
    if ema_decay is not None:
        if state.ema_params is None:
            raise ValueError(
                "the step was built with ema_decay but the state carries no"
                " ema_params; build it with create_train_state(...,"
                " ema_decay=...)"
            )
        ema_params = _ema_update(state.ema_params, params, ema_decay)
    new_state = TrainState(
        step=state.step + 1,
        params=params,
        opt_state=opt_state,
        model_state=model_state,
        ema_params=ema_params,
    )
    return new_state, loss, grads


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    donate: bool = True,
    with_model_state: bool = False,
    ema_decay: Any = None,
    with_metrics: bool = False,
):
    """Build a jitted ``step(state, *batch) -> (state, loss)``.

    ``loss_fn(params, *batch)`` must return a scalar.  With
    ``with_model_state=True`` the signature becomes
    ``loss_fn(params, model_state, *batch) -> (scalar, new_model_state)``
    (e.g. flax ``mutable=['batch_stats']`` apply for BatchNorm training);
    the updated model state is carried in the returned TrainState.
    NOTE: the returned new_model_state REPLACES the old one wholesale --
    when the model also carries immutable collections (e.g. the "consts"
    Fourier tables), merge them back: ``{**model_state, **mutated}``.

    ``ema_decay``: maintain ``state.ema_params`` as an exponential moving
    average of params (the state must come from
    ``create_train_state(..., ema_decay=...)``).  Fused into the same XLA
    computation -- no extra dispatch.

    ``with_metrics``: return ``(state, {"loss", "grad_norm", "param_norm"})``
    instead of ``(state, loss)`` -- the norms are computed from the grads
    already in registers, so logging them costs no extra pass.
    """

    def step(state: TrainState, *batch):
        new_state, loss, grads = _step_body(
            state, batch, loss_fn, tx, with_model_state, ema_decay
        )
        if with_metrics:
            return new_state, {
                "loss": loss,
                "grad_norm": optax.global_norm(grads),
                "param_norm": optax.global_norm(new_state.params),
            }
        return new_state, loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    donate: bool = True,
    with_model_state: bool = False,
    ema_decay: Any = None,
):
    """Build ``step(state, *stacked_batch) -> (state, losses)`` that runs
    ONE optimizer update per leading-axis slice of the stacked batch args,
    all inside a single XLA computation (``lax.scan`` over the step axis).

    Why: on the remote TPU transport every executable launch costs fixed
    dispatch latency on top of device time (measured on the full-size MLM
    step: 30.7 ms wall vs 22.2 ms device busy -- 28% overhead).  Scanning
    N steps per dispatch pays that cost once per N.  The scan body is the
    same single-step computation, so compile time does not grow with N and
    losses come back per step ([N] array).

    Batch args must be stacked with a leading step axis: shapes
    ``[n_steps, batch, ...]``.  Pair with ``training.data.prefetch_to_device``
    feeding stacked super-batches.
    """

    def one(state: TrainState, batch):
        new_state, loss, _ = _step_body(
            state, batch, loss_fn, tx, with_model_state, ema_decay
        )
        return new_state, loss

    def step(state: TrainState, *stacked_batch):
        return jax.lax.scan(one, state, tuple(stacked_batch))

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a params tree from the TP partition rules."""
    from perceiverio_pytorch_tpu.parallel.sharding import variables_shardings

    # delegate so the rule walk has one home (parallel/sharding.py)
    return variables_shardings({"params": params}, mesh)["params"]


def create_sharded_train_state(
    params,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    model_state: Any = None,
    ema_decay: Any = None,
) -> TrainState:
    """Place params per the TP rules and build the optimizer state on-mesh.

    ``tx.init`` runs jitted with the params' shardings as inputs; GSPMD
    propagates them into the same-shaped moment tensors, so adam state is
    sharded exactly like its params without hand-written rules.
    ``model_state`` (e.g. BatchNorm batch_stats -- small per-channel
    vectors) is replicated across the mesh.
    """
    p_sh = param_shardings(params, mesh)
    params = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, s), params, p_sh
    )
    opt_state = jax.jit(tx.init, in_shardings=(p_sh,))(params)
    # Scalar leaves (e.g. adam's step count) come back single-device from the
    # unconstrained init; replicate anything not already on the full mesh.
    mesh_devices = set(mesh.devices.flat)

    def _ensure_on_mesh(leaf):
        if set(leaf.sharding.device_set) != mesh_devices:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return leaf

    opt_state = jax.tree_util.tree_map(_ensure_on_mesh, opt_state)
    if model_state is not None:
        model_state = jax.tree_util.tree_map(
            lambda v: jax.device_put(v, NamedSharding(mesh, P())), model_state
        )
    ema_params = None
    if ema_decay is not None:
        # Fresh buffers with the params' shardings (see create_train_state on
        # why ema must not alias params under donation).
        ema_params = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.array, t), out_shardings=p_sh
        )(params)
    return TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P())),
        params=params,
        opt_state=opt_state,
        model_state=model_state,
        ema_params=ema_params,
    )


def make_sharded_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,
    num_batch_args: int = 1,
    donate: bool = True,
    with_model_state: bool = False,
    ema_decay: Any = None,
    with_metrics: bool = False,
):
    """Mesh-sharded train step for a state built by create_sharded_train_state.

    Batch args have their leading axis sharded over the data axis.  With
    ``with_model_state=True``, ``loss_fn(params, model_state, *batch)``
    returns ``(scalar, new_model_state)``; under jit+GSPMD, BatchNorm's
    batch statistics reduce over the GLOBAL (all-replica) batch
    automatically -- the sharded batch axis mean IS the cross-replica
    mean, XLA inserts the collectives (no pmap-style axis_name plumbing).
    ``ema_decay`` / ``with_metrics`` as in make_train_step (EMA leaves keep
    their params' shardings).
    """
    state_sh = jax.tree_util.tree_map(lambda x: x.sharding, state)
    batch_sh = (batch_sharding(mesh),) * num_batch_args
    scalar_sh = NamedSharding(mesh, P())
    out_sh = (
        {"loss": scalar_sh, "grad_norm": scalar_sh, "param_norm": scalar_sh}
        if with_metrics
        else scalar_sh
    )

    def step(state: TrainState, *batch):
        new_state, loss, grads = _step_body(
            state, batch, loss_fn, tx, with_model_state, ema_decay
        )
        if with_metrics:
            return new_state, {
                "loss": loss,
                "grad_norm": optax.global_norm(grads),
                "param_norm": optax.global_norm(new_state.params),
            }
        return new_state, loss

    return jax.jit(
        step,
        in_shardings=(state_sh,) + batch_sh,
        out_shardings=(state_sh, out_sh),
        donate_argnums=(0,) if donate else (),
    )

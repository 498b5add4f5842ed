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
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from perceiverio_pytorch_tpu.parallel.sharding import (
    batch_sharding,
    param_partition_spec,
)


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # Non-differentiable model variables carried across steps (e.g. the conv
    # preprocessor's BatchNorm batch_stats).  None for purely functional
    # models.
    model_state: Any = None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state, s.model_state), None),
    lambda _, c: TrainState(*c),
)


def create_train_state(
    params, tx: optax.GradientTransformation, model_state: Any = None
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        model_state=model_state,
    )


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    donate: bool = True,
    with_model_state: bool = False,
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
    """

    def step(state: TrainState, *batch):
        if with_model_state:
            (loss, model_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.model_state, *batch)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch)
            model_state = state.model_state
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                model_state=model_state,
            ),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    donate: bool = True,
    with_model_state: bool = False,
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
        if with_model_state:
            (loss, model_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.model_state, *batch)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch)
            model_state = state.model_state
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                model_state=model_state,
            ),
            loss,
        )

    def step(state: TrainState, *stacked_batch):
        return jax.lax.scan(one, state, tuple(stacked_batch))

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a params tree from the TP partition rules."""
    flat = flatten_dict(params)
    return unflatten_dict(
        {
            path: NamedSharding(mesh, param_partition_spec(path, value))
            for path, value in flat.items()
        }
    )


def create_sharded_train_state(
    params,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    model_state: Any = None,
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
    return TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P())),
        params=params,
        opt_state=opt_state,
        model_state=model_state,
    )


def make_sharded_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,
    num_batch_args: int = 1,
    donate: bool = True,
    with_model_state: bool = False,
):
    """Mesh-sharded train step for a state built by create_sharded_train_state.

    Batch args have their leading axis sharded over the data axis.  With
    ``with_model_state=True``, ``loss_fn(params, model_state, *batch)``
    returns ``(scalar, new_model_state)``; under jit+GSPMD, BatchNorm's
    batch statistics reduce over the GLOBAL (all-replica) batch
    automatically -- the sharded batch axis mean IS the cross-replica
    mean, XLA inserts the collectives (no pmap-style axis_name plumbing).
    """
    state_sh = jax.tree_util.tree_map(lambda x: x.sharding, state)
    batch_sh = (batch_sharding(mesh),) * num_batch_args

    def step(state: TrainState, *batch):
        if with_model_state:
            (loss, model_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.model_state, *batch)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch)
            model_state = state.model_state
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                model_state=model_state,
            ),
            loss,
        )

    return jax.jit(
        step,
        in_shardings=(state_sh,) + batch_sh,
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )

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


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree for a params tree from the TP partition rules
    (+ ZeRO-3 data-axis weight sharding with ``fsdp=True``)."""
    from perceiverio_pytorch_tpu.parallel.sharding import variables_shardings

    # delegate so the rule walk has one home (parallel/sharding.py)
    return variables_shardings({"params": params}, mesh, fsdp=fsdp)["params"]


def opt_state_shardings(tx, params, p_sh, mesh: Mesh):
    """NamedSharding pytree for ``tx.init(params)`` mirroring the params'.

    Optimizer moments (adam mu/nu, momentum trace, MultiSteps accumulators)
    embed copies of the params tree, so any opt-state leaf whose key path
    ends with a param's key path (and matches its shape) takes that param's
    sharding; everything else (step counts, scalars) is replicated.  Needed
    because GSPMD does NOT propagate input shardings into jit outputs --
    ``tx.init`` must be constrained with explicit out_shardings or the
    moments come back replicated, silently forfeiting TP/FSDP memory scaling
    on the optimizer state (2x the param bytes for adam).
    """
    repl = NamedSharding(mesh, P())
    p_flat, _ = jax.tree_util.tree_flatten_with_path(params)
    sh_flat = jax.tree_util.tree_leaves(p_sh)
    by_path = [
        (tuple(path), leaf.shape, sh)
        for (path, leaf), sh in zip(p_flat, sh_flat)
    ]
    abstract = jax.eval_shape(tx.init, params)
    q_flat, q_def = jax.tree_util.tree_flatten_with_path(abstract)

    def pick(qpath, leaf):
        qpath = tuple(qpath)
        best = None
        for path, shape, sh in by_path:
            n = len(path)
            if (
                len(qpath) >= n
                and qpath[-n:] == path
                and getattr(leaf, "shape", None) == shape
            ):
                if best is None or n > best[0]:
                    best = (n, sh)
        return best[1] if best else repl

    return jax.tree_util.tree_unflatten(
        q_def, [pick(p, l) for p, l in q_flat]
    )


def create_sharded_train_state(
    params,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    model_state: Any = None,
    ema_decay: Any = None,
    fsdp: bool = False,
) -> TrainState:
    """Place params per the TP rules and build the optimizer state on-mesh.

    ``tx.init`` runs jitted with the params' shardings as inputs AND
    explicit matching out_shardings (opt_state_shardings) -- GSPMD does not
    propagate input shardings into jit outputs, so without the constraint
    adam moments would come back replicated.  ``model_state`` (e.g.
    BatchNorm batch_stats -- small per-channel vectors) is replicated
    across the mesh.

    ``fsdp=True`` composes ZeRO-3 weight sharding over the data axis onto
    the TP rules: each replica holds 1/data of every >=2-D param and its
    optimizer moments (parallel/sharding.fsdp_param_partition_spec); XLA
    all-gathers weights at use and reduce-scatters grads.
    """
    p_sh = param_shardings(params, mesh, fsdp=fsdp)
    params = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, s), params, p_sh
    )
    opt_sh = opt_state_shardings(tx, params, p_sh, mesh)
    opt_state = jax.jit(
        tx.init, in_shardings=(p_sh,), out_shardings=opt_sh
    )(params)
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

"""GPipe-style pipeline parallelism over the latent self-attention stack.

The reference is strictly single-device (SURVEY.md 2.3: no DP/TP/PP of any
kind).  DP and TP live in parallel/{sharding,api}; SP in sequence_parallel.
This module adds the remaining classic axis: PIPELINE parallelism, sharding
the *depth* of the latent stack across devices.

The natural Perceiver target is a deep non-weight-shared stack -- flow ships
24 distinct self-attention layers in one block
(/root/reference/perceiver_io/flow_perceiver.py:34-42: num_blocks=1,
num_self_attends_per_block=24).  With ``n`` pipeline stages each device
holds ``24/n`` layers' params (and optimizer state, under a pp-sharded
train step), and microbatches stream through the stages over ICI.

TPU-native formulation (the "How to Scale Your Model" recipe): one SPMD
program under ``shard_map`` over a ``pipe`` mesh axis.  Per-stage params are
stacked on a leading [n_stages] axis and sharded over that axis; activations
rotate stage-to-stage with a single ``lax.ppermute`` per step inside a
``lax.scan`` over ``num_microbatches + n_stages - 1`` ticks (the GPipe
schedule; the ``n_stages - 1`` warm-up/drain ticks are the pipeline bubble).
Every device runs the identical program -- no data-dependent control flow,
so XLA compiles one fused step body.

Communication per tick is one [microbatch, N_latents, D] hop over ICI;
params never move.  The latent array is the Perceiver's SMALL axis (<= 2048
tokens), so streaming latents while pinning the depth-sharded weights is
exactly the right bandwidth trade on TPU.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipeline_mesh(n_stages: int, *, data: int = 1,
                       devices=None) -> Mesh:
    """A (data, pipe) mesh using ``data * n_stages`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * n_stages
    if need > len(devices):
        raise ValueError(
            f"pipeline mesh needs {need} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(data, n_stages)
    return Mesh(arr, ("data", PIPE_AXIS))


def stack_layer_params(layer_params: dict, n_stages: int,
                       circ_repeats: int = 1):
    """Stack per-layer param subtrees into a pipeline-shardable pytree.

    Args:
      layer_params: ``{"0": subtree, "1": subtree, ...}`` -- the children of
        the encoder's ``self_attends`` collection (one identical-structure
        subtree per distinct self-attention layer, core/perceiver.py:100-113).
      n_stages: number of pipeline stages; with ``circ_repeats`` they must
        jointly divide the layer count.
      circ_repeats: virtual stages per device for the circular (interleaved)
        schedule.  Layers are assigned round-robin: virtual stage
        ``k = g*n_stages + s`` (repeat ``g``, device ``s``) holds layers
        ``[k*per, (k+1)*per)``, so a microbatch visits the devices in ring
        order ``circ_repeats`` times and still sees the layers in order.

    Returns:
      ``circ_repeats == 1``: leaves [n_stages, layers_per_stage, ...] (dim 0
      sharded over the ``pipe`` axis, dim 1 scanned by the stage body).
      ``circ_repeats > 1``: leaves [n_stages, circ_repeats, per, ...]
      where [s, g] is device s's g-th layer group.
    """
    names = sorted(layer_params, key=int)
    n_layers = len(names)
    if circ_repeats < 1:
        raise ValueError(f"circ_repeats must be >= 1; got {circ_repeats}")
    if n_layers % (n_stages * circ_repeats):
        raise ValueError(
            f"{n_layers} layers do not divide into {n_stages} stages"
            + (f" x {circ_repeats} circular repeats" if circ_repeats > 1
               else "")
        )
    per = n_layers // (n_stages * circ_repeats)
    stacked = jax.tree.map(
        lambda *leaves: jnp.stack(leaves), *[layer_params[n] for n in names]
    )
    if circ_repeats == 1:
        return jax.tree.map(
            lambda a: a.reshape(n_stages, per, *a.shape[1:]), stacked
        )
    # [vstage k, per, ...] -> [g, s, per, ...] -> [s, g, per, ...]
    return jax.tree.map(
        lambda a: a.reshape(
            circ_repeats, n_stages, per, *a.shape[1:]
        ).swapaxes(0, 1),
        stacked,
    )


def unstack_layer_params(stacked, layer_names=None,
                         circ_repeats: int = 1) -> dict:
    """Inverse of stack_layer_params: stacked layout -> per-layer dict.

    Used to map pipeline-layout gradients/updated params back onto the
    model's original ``self_attends`` tree (e.g. to checkpoint in the
    portable layout).  Pass the SAME ``circ_repeats`` the tree was stacked
    with: the circular layout carries three leading stacking dims
    ([n_stages, v, per, ...]) instead of two, which cannot be told apart
    from a single tree without knowing the original param ranks -- a
    mismatched call would silently produce a wrong-shaped tree.
    """
    if circ_repeats < 1:
        raise ValueError(f"circ_repeats must be >= 1; got {circ_repeats}")
    if circ_repeats > 1:
        return unstack_layer_params_circular(stacked, layer_names)
    leaves = jax.tree.leaves(stacked)
    n_layers = leaves[0].shape[0] * leaves[0].shape[1]
    names = layer_names or [str(i) for i in range(n_layers)]
    flat = jax.tree.map(
        lambda a: a.reshape(n_layers, *a.shape[2:]), stacked
    )
    return {
        name: jax.tree.map(lambda a, i=i: a[i], flat)
        for i, name in enumerate(names)
    }


def unstack_layer_params_circular(stacked, layer_names=None) -> dict:
    """Inverse of ``stack_layer_params(..., circ_repeats=v)`` for v > 1:
    [n_stages, v, per, ...] -> per-layer dict in original layer order."""
    leaves = jax.tree.leaves(stacked)
    s, v = leaves[0].shape[0], leaves[0].shape[1]
    n_layers = s * v * leaves[0].shape[2]
    names = layer_names or [str(i) for i in range(n_layers)]
    # [s, g, per, ...] -> [g, s, per, ...] -> [vstage*per, ...]
    flat = jax.tree.map(
        lambda a: a.swapaxes(0, 1).reshape(n_layers, *a.shape[3:]), stacked
    )
    return {
        name: jax.tree.map(lambda a, i=i: a[i], flat)
        for i, name in enumerate(names)
    }


def pp_param_shardings(stacked, mesh: Mesh, axis_name: str = PIPE_AXIS):
    """NamedSharding pytree placing stacked layer params over the pipe axis.

    Every leaf of a ``stack_layer_params`` tree has leading [n_stages]; the
    pipe-axis sharding means each device HOLDS only its own stage's layers
    (1/n_stages of the stack's params) -- the memory-scaling half of
    pipeline parallelism.  ``jax.jit(tx.init, in_shardings=...)`` on params
    placed this way propagates the same shardings into the optimizer
    moments, so adam state is stage-local too.  Training in the stacked
    layout is numerically identical to per-layer training (adam is
    elementwise); checkpoint portably via ``unstack_layer_params`` (pass
    the tree's ``circ_repeats`` for the circular layout).
    """
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis_name)), stacked
    )


def _stage_scan_fn(
    layer_apply: Callable[..., jnp.ndarray], with_rng: bool = False
):
    """Stage body: fold the device's [layers_per_stage, ...] params over x.

    With ``with_rng`` the returned stage_fn takes a third argument -- the
    per-(tick, stage) PRNG key minted by ``pipeline_spmd`` -- and hands each
    local layer a distinct ``fold_in(key, layer_idx)``, so every dropout
    application site in the pipelined stack draws an independent mask.
    """
    if not with_rng:

        def stage_fn(local_params, x):
            def body(h, p):
                return layer_apply(p, h), None

            y, _ = jax.lax.scan(body, x, local_params)
            return y

        return stage_fn

    def stage_fn(local_params, x, key):
        per = jax.tree.leaves(local_params)[0].shape[0]

        def body(h, p_i):
            p, i = p_i
            return layer_apply(p, h, jax.random.fold_in(key, i)), None

        y, _ = jax.lax.scan(body, x, (local_params, jnp.arange(per)))
        return y

    return stage_fn


def pipeline_spmd(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stage_params,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis_name: str = PIPE_AXIS,
    batch_axis: Optional[str] = "data",
    num_blocks: int = 1,
    rng: Optional[jax.Array] = None,
    circ_repeats: int = 1,
) -> jnp.ndarray:
    """Run ``x`` through a depth-sharded stack with the GPipe schedule.

    Args:
      stage_fn: ``(local_stage_params, x_mb) -> y_mb``; applied by every
        device to its own stage slice.  Must preserve shape/dtype (residual
        stacks do).  When ``rng`` is given the signature becomes
        ``(local_stage_params, x_mb, key) -> y_mb``.
      stage_params: pytree with leading [n_stages] axis on every leaf
        (see stack_layer_params), sharded over ``axis_name``.
      x: [B, ...] activations; B must divide into ``num_microbatches``.
      mesh: mesh containing ``axis_name`` (and optionally ``batch_axis``).
      batch_axis: mesh axis to keep the microbatch's own batch dim sharded
        over (data parallelism composing with the pipeline); None replicates.
      num_blocks: weight-shared repetitions of the WHOLE stack
        (PerceiverEncoder num_blocks): the full pipeline pass is re-entered
        with shared weights, matching the reference's block loop
        (perceiver.py:104-106).
      rng: optional base PRNG key for stochastic stage bodies (dropout
        training).  Each schedule tick hands ``stage_fn`` a device-varying
        ``fold_in(fold_in(fold_in(rng, block), tick), stage_idx)`` key, so
        every (block, microbatch, stage) application draws independent
        randomness; warm-up/drain ticks burn keys on garbage that the write
        mask discards, which is harmless.
      circ_repeats: > 1 runs the CIRCULAR (interleaved) schedule: each
        device holds ``circ_repeats`` round-robin layer groups
        (``stack_layer_params(..., circ_repeats=v)``, leaves
        [n_stages, v, per, ...]) and every microbatch cycles the ring v
        times, recirculating from the last stage back into stage 0.  The
        pipeline bubble shrinks from ``(S-1)/(M+S-1)`` ticks to
        ``(S-1)/(vM+S-1)`` -- v times less idle ICI/MXU time for the same
        per-device memory.  Requires ``num_microbatches >= n_stages`` (a
        recirculating microbatch re-enters stage 0 exactly M ticks after
        it left it, so the ring must be at least as long as the hop back).

    Returns:
      [B, ...] outputs, microbatch order preserved.

    Differentiable: the schedule is scan + ppermute + masked updates, all
    with exact AD rules, so this drops into a pp-sharded train step as-is
    (dropout masks are data derived from ``rng``; AD flows through them).
    """
    n_stages = mesh.shape[axis_name]
    b = x.shape[0]
    if b % num_microbatches:
        raise ValueError(
            f"batch {b} does not divide into {num_microbatches} microbatches"
        )
    mb = b // num_microbatches
    if batch_axis is not None and (
        batch_axis not in mesh.shape or mb % mesh.shape[batch_axis]
    ):
        batch_axis = None
    xs = x.reshape(num_microbatches, mb, *x.shape[1:])

    x_spec = P(None, batch_axis)
    param_specs = jax.tree.map(lambda _: P(axis_name), stage_params)
    has_rng = rng is not None
    if circ_repeats < 1:
        raise ValueError(f"circ_repeats must be >= 1; got {circ_repeats}")
    if circ_repeats > 1 and num_microbatches < n_stages:
        raise ValueError(
            f"the circular schedule needs num_microbatches"
            f" ({num_microbatches}) >= n_stages ({n_stages}): a microbatch"
            " re-enters stage 0 exactly num_microbatches ticks after"
            " leaving it"
        )

    def body_circular(params_local, xs, key):
        # local layout [v, per, ...]: the device's circ_repeats layer groups
        params_local = jax.tree.map(lambda a: jnp.squeeze(a, 0), params_local)
        idx = jax.lax.axis_index(axis_name)
        v, total = circ_repeats, circ_repeats * num_microbatches
        n_ticks = total + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        state = jax.lax.pcast(
            jnp.zeros_like(xs[0]), (axis_name,), to="varying"
        )
        outputs = jax.lax.pcast(jnp.zeros_like(xs), (axis_name,), to="varying")
        # stage 0's recirculation buffer: slot m holds microbatch m's
        # activations between leaving the last stage on repeat g and
        # re-entering stage 0 on repeat g+1 (single slot per microbatch is
        # enough: re-entry is exactly M ticks after exit, see docstring)
        buf = jax.lax.pcast(jnp.zeros_like(xs), (axis_name,), to="varying")

        def tick(carry, t):
            state, outputs, buf = carry
            # this device works on stream item u = t - idx (microbatch
            # u % M on its repeat u // M); out-of-range u is warm-up/drain
            # garbage discarded by the masks below
            u = jnp.clip(t - idx, 0, total - 1)
            m = u % num_microbatches
            g = u // num_microbatches
            # stage 0 input: fresh microbatch on repeat 0, recirculated
            # from the buffer on later repeats
            first_in = jnp.where(g == 0, xs[m], buf[m])
            h = jnp.where(idx == 0, first_in, state)
            p_g = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, g, 0, keepdims=False
                ),
                params_local,
            )
            if has_rng:
                y = stage_fn(
                    p_g, h,
                    jax.random.fold_in(jax.random.fold_in(key, t), idx),
                )
            else:
                y = stage_fn(p_g, h)
            # the last stage emits microbatch m when it finishes repeat v-1
            valid = (t - idx >= 0) & (t - idx < total)
            is_out = valid & (idx == n_stages - 1) & (g == v - 1)
            written = jax.lax.dynamic_update_slice(
                outputs, y[None], (m,) + (0,) * y.ndim
            )
            outputs = jnp.where(is_out, written, outputs)
            # ring hop; what stage 0 receives from the last stage was
            # stream item u_prev = t - (n_stages - 1) -- if it has repeats
            # left, park it in the buffer for re-entry at tick u_prev + M
            state = jax.lax.ppermute(y, axis_name, perm)
            u_prev = t - (n_stages - 1)
            recirc = (u_prev >= 0) & (u_prev < total - num_microbatches)
            m_in = jnp.clip(u_prev, 0, total - 1) % num_microbatches
            buf_written = jax.lax.dynamic_update_slice(
                buf, state[None], (m_in,) + (0,) * state.ndim
            )
            buf = jnp.where(recirc, buf_written, buf)
            return (state, outputs, buf), None

        (_, outputs, _), _ = jax.lax.scan(
            tick, (state, outputs, buf), jnp.arange(n_ticks)
        )
        outputs = jax.lax.psum(
            jnp.where(idx == n_stages - 1, outputs, 0), axis_name
        )
        return outputs

    def body(params_local, xs, key):
        params_local = jax.tree.map(lambda a: jnp.squeeze(a, 0), params_local)
        idx = jax.lax.axis_index(axis_name)
        n_ticks = num_microbatches + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        # the carries become device-varying inside the tick body (idx-masked
        # writes); mark the zero initials as varying so the scan typechecks
        state = jax.lax.pcast(
            jnp.zeros_like(xs[0]), (axis_name,), to="varying"
        )
        outputs = jax.lax.pcast(jnp.zeros_like(xs), (axis_name,), to="varying")

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clamped reads past the end are
            # discarded by the write mask below -- drain ticks)
            inject = xs[jnp.minimum(t, num_microbatches - 1)]
            h = jnp.where(idx == 0, inject, state)
            if has_rng:
                y = stage_fn(
                    params_local, h,
                    jax.random.fold_in(jax.random.fold_in(key, t), idx),
                )
            else:
                y = stage_fn(params_local, h)
            # the last stage emits microbatch t-(n_stages-1) once the
            # pipeline is full; earlier ticks are warm-up garbage
            out_t = jnp.clip(t - (n_stages - 1), 0, num_microbatches - 1)
            written = jax.lax.dynamic_update_slice(
                outputs, y[None], (out_t,) + (0,) * y.ndim
            )
            outputs = jnp.where(t >= n_stages - 1, written, outputs)
            # rotate activations one stage forward over ICI
            state = jax.lax.ppermute(y, axis_name, perm)
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(n_ticks)
        )
        # only the last stage holds real outputs; psum broadcasts them
        outputs = jax.lax.psum(
            jnp.where(idx == n_stages - 1, outputs, 0), axis_name
        )
        return outputs

    fn = jax.shard_map(
        body_circular if circ_repeats > 1 else body, mesh=mesh,
        in_specs=(param_specs, x_spec, P()),
        out_specs=x_spec,
    )
    out = xs
    for blk in range(num_blocks):
        key = (
            jax.random.fold_in(rng, blk) if has_rng
            else jax.random.PRNGKey(0)
        )
        out = fn(stage_params, out, key)
    return out.reshape(b, *x.shape[1:])


def pipelined_self_attends(
    layer,
    layer_params: dict,
    latents: jnp.ndarray,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis_name: str = PIPE_AXIS,
    batch_axis: Optional[str] = "data",
    num_blocks: int = 1,
    stacked: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    circ_repeats: int = 1,
) -> jnp.ndarray:
    """Apply an encoder's distinct-layer self-attend stack as a pipeline.

    Args:
      layer: a ``core.attention.SelfAttention`` instance configured like the
        encoder's layers (all layers share one config, perceiver.py:100-113).
      layer_params: the encoder's ``self_attends`` param children
        (``{"0": ..., "1": ...}``), or an already-stacked pytree if
        ``stacked=True`` (pass the stacked form when calling from a jitted
        train step so stacking cost isn't re-traced).
      latents: [B, N, D].
      dropout_rng: when given, layers run non-deterministic and each
        (microbatch, stage, layer) application draws an independent dropout
        key folded from it (training through the pipeline).
      circ_repeats: > 1 runs the circular (interleaved) schedule with this
        many round-robin layer groups per device (see pipeline_spmd) --
        same outputs, (S-1)/(v*M+S-1) bubble instead of (S-1)/(M+S-1).

    Returns:
      [B, N, D], numerically equal to applying the layers sequentially
      (modulo dropout-mask assignment when ``dropout_rng`` is given: masks
      are keyed by schedule position, not by the sequential layer order).
    """
    if stacked and circ_repeats > 1:
        # a [S, per, ...] tree fed to the circular schedule would silently
        # index layers as groups; the circular layout is [S, v, per, ...]
        lead = jax.tree.leaves(layer_params)[0].shape
        if len(lead) < 3 or lead[1] != circ_repeats:
            raise ValueError(
                f"stacked=True with circ_repeats={circ_repeats} expects the"
                f" [n_stages, {circ_repeats}, per, ...] layout from"
                f" stack_layer_params(..., circ_repeats={circ_repeats});"
                f" got leading dims {tuple(lead[:3])}"
            )
    stage_params = (
        layer_params if stacked
        else stack_layer_params(
            layer_params, mesh.shape[axis_name], circ_repeats=circ_repeats
        )
    )
    if dropout_rng is not None:
        stage_fn = _stage_scan_fn(
            lambda p, h, k: layer.apply(
                {"params": p}, h, deterministic=False, rngs={"dropout": k}
            ),
            with_rng=True,
        )
    else:
        stage_fn = _stage_scan_fn(
            lambda p, h: layer.apply({"params": p}, h, deterministic=True)
        )
    return pipeline_spmd(
        stage_fn, stage_params, latents, mesh,
        num_microbatches=num_microbatches, axis_name=axis_name,
        batch_axis=batch_axis, num_blocks=num_blocks, rng=dropout_rng,
        circ_repeats=circ_repeats,
    )

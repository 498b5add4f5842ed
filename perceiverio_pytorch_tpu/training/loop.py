"""Minimal training loop with structured metrics logging.

The reference is inference-only (SURVEY.md 4); this provides the framework's
end-to-end trainability story: donated jitted steps (optionally mesh-sharded),
JSONL metrics (step, loss, steps/sec), periodic Orbax checkpoints.
"""

from __future__ import annotations

import json
import os
import signal
import threading
import time
from typing import Callable, Iterable, Optional

import optax
from jax.sharding import Mesh

from perceiverio_pytorch_tpu.training.trainer import (
    TrainState,
    create_sharded_train_state,
    create_train_state,
    make_multi_step,
    make_sharded_train_step,
    make_train_step,
)


class MetricsLogger:
    """Append-only JSONL metrics writer (plus stdout echo)."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._file = open(path, "a")
        else:
            self._file = None

    def log(self, **metrics):
        line = json.dumps(metrics)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self.echo:
            print(line, flush=True)

    def close(self):
        if self._file:
            self._file.close()


def _stack_groups(batches, group: int):
    """Stack consecutive batches on a new leading [group] step axis.

    Feeds ``make_multi_step``.  A short tail group is stacked at its own
    length (one extra compile for the tail shape).  Host-numpy batches are
    stacked with numpy (one device transfer, no extra XLA dispatch);
    device-resident batches fall back to jnp.stack.
    """
    import jax.numpy as jnp
    import numpy as np

    def _stack(parts):
        if all(isinstance(p, np.ndarray) for p in parts):
            return np.stack(parts)
        return jnp.stack(parts)

    buf = []
    for b in batches:
        buf.append(b if isinstance(b, (tuple, list)) else (b,))
        if len(buf) == group:
            yield tuple(_stack(parts) for parts in zip(*buf))
            buf = []
    if buf:
        yield tuple(_stack(parts) for parts in zip(*buf))


class _PreemptionGuard:
    """Turns SIGTERM (and optionally SIGINT) into a graceful-stop flag.

    Preemptible/spot TPU VMs get SIGTERM with a grace window before the
    machine disappears; the right response is to finish the in-flight step,
    write a checkpoint, and exit cleanly so ``fit(resume=True)`` continues
    from it.  Signal handlers can only be installed from the main thread --
    elsewhere the guard degrades to a permanent no (no signal capture).
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = signals
        self._prev = {}
        self.requested = False

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        return False


class Trainer:
    """Drives a jitted train step over a batch iterator.

    Args:
      loss_fn: ``loss_fn(params, *batch) -> scalar`` (or
        ``loss_fn(params, model_state, *batch) -> (scalar, new_model_state)``
        with ``with_model_state=True``).
      tx: optax optimizer (see training.optim.build_optimizer for schedules,
        clipping, and gradient accumulation).
      mesh: optional device mesh; enables DP/TP sharded stepping.
      fsdp: with a mesh, also shard weights + optimizer moments over the
        data axis (ZeRO-3; parallel/sharding.fsdp_param_partition_spec).
      num_batch_args: arity of each batch tuple (sharded case only).
      eval_fn: optional ``eval_fn(params, *batch) -> scalar`` (or with
        model_state, mirroring loss_fn's signature minus the aux return);
        run over ``eval_batches`` every ``eval_every`` steps and logged as
        ``eval_loss``.
      checkpoint_keep: retain only the newest N periodic checkpoints
        (pruned after each save; crashed partial saves older than the
        newest good one are swept too).  0 (default) keeps everything.
      checkpoint_final: also checkpoint the returned state when ``fit``
        ends for any reason other than an exactly-at-a-save-point stop
        (budget reached, stream exhausted) so the end of the run is never
        lost to the ``checkpoint_every`` grid.
      checkpoint_async: write periodic checkpoints in the background
        (checkpoint.AsyncCheckpointWriter): the device->host snapshot is
        synchronous but the disk write overlaps the following train steps.
        At most one save is in flight; fit() finalises the last one before
        returning, and resume safety is unchanged (unfinalised saves are
        ignored by latest_checkpoint).
      ema_decay: maintain an exponential moving average of params in
        ``state.ema_params`` (evaluate/export with those for the usual
        late-training stability win).  Fused into the train step.
      log_grad_norm: also log ``grad_norm`` and ``param_norm`` at each
        logging point (computed inside the step from the gradients already
        in flight -- no extra pass; incompatible with steps_per_call > 1).
      lr_schedule: pass the ``build_schedule`` result here as well to log
        the learning rate of each logged step as ``lr``.  The lookup is
        evaluated as ``schedule(step - 1)`` OUTSIDE the throughput timing
        window (it is a device dispatch on this transport).  With
        ``accum_steps=k`` the optimizer advances its internal schedule
        once per k micro-steps — pass ``lambda s: sched(s // k)`` to log
        the applied value.
      prefetch: keep this many batches device-put ahead of the step loop
        (training.data.prefetch_to_device) so the host input path and the
        transfer overlap device compute.  With a mesh, batches land
        pre-sharded over the data axis.  0 disables (default).
      steps_per_call: run this many optimizer updates per device dispatch
        (``make_multi_step``'s lax.scan).  Amortises the fixed per-launch
        transport latency -- measured 28% of the full-size MLM step on the
        remote TPU transport.  Consecutive batches are stacked on a new
        leading axis host-side.  Single-device path only (ignored when a
        mesh is given); log/eval/checkpoint cadences fire on boundary
        crossings, so keep them multiples of ``steps_per_call`` for exact
        alignment.
    """

    def __init__(
        self,
        loss_fn: Callable,
        tx: optax.GradientTransformation,
        mesh: Optional[Mesh] = None,
        fsdp: bool = False,
        num_batch_args: int = 1,
        metrics_path: Optional[str] = None,
        log_every: int = 10,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        checkpoint_keep: int = 0,
        checkpoint_final: bool = False,
        checkpoint_async: bool = False,
        with_model_state: bool = False,
        eval_fn: Optional[Callable] = None,
        eval_every: int = 0,
        steps_per_call: int = 1,
        prefetch: int = 0,
        ema_decay: Optional[float] = None,
        log_grad_norm: bool = False,
        lr_schedule: Optional[Callable] = None,
    ):
        self.loss_fn = loss_fn
        self.tx = tx
        self.mesh = mesh
        self.fsdp = bool(fsdp)
        if self.fsdp and mesh is None:
            raise ValueError(
                "Trainer(fsdp=True) needs a mesh -- without one there is no"
                " data axis to shard the weights over and training would"
                " silently run fully replicated"
            )
        self.num_batch_args = num_batch_args
        self.with_model_state = with_model_state
        self.logger = MetricsLogger(metrics_path)
        self.log_every = log_every
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.checkpoint_keep = int(checkpoint_keep)
        self.checkpoint_final = checkpoint_final
        self.checkpoint_async = bool(checkpoint_async)
        self._async_writer = None
        self.eval_fn = eval_fn
        self.eval_every = eval_every
        self.steps_per_call = max(int(steps_per_call), 1)
        self.prefetch = max(int(prefetch), 0)
        self.ema_decay = ema_decay
        self.log_grad_norm = log_grad_norm
        self.lr_schedule = lr_schedule
        self._lr_jit = None
        if log_grad_norm and self.steps_per_call > 1:
            raise ValueError(
                "log_grad_norm is not available with steps_per_call > 1"
                " (the multi-step scan returns per-step losses only)"
            )
        self._eval_jit = None

    def init_state(self, params, model_state=None) -> TrainState:
        if self.mesh is not None:
            return create_sharded_train_state(
                params, self.tx, self.mesh, model_state=model_state,
                ema_decay=self.ema_decay, fsdp=self.fsdp,
            )
        return create_train_state(
            params, self.tx, model_state=model_state, ema_decay=self.ema_decay
        )

    def evaluate(
        self, state: TrainState, eval_batches, use_ema: Optional[bool] = None
    ) -> float:
        """Mean eval_fn value over the eval batches (params frozen).

        ``use_ema``: evaluate with ``state.ema_params`` instead of the live
        params.  Default (None) uses EMA whenever the state carries it --
        the averaged weights are what EMA training evaluates and exports.
        """
        import jax

        if use_ema is None:
            use_ema = state.ema_params is not None
        if use_ema and state.ema_params is None:
            raise ValueError(
                "evaluate(use_ema=True) needs state.ema_params; build the"
                " state with ema_decay"
            )
        params = state.ema_params if use_ema else state.params
        if self._eval_jit is None:
            if self.with_model_state:
                self._eval_jit = jax.jit(
                    lambda p, ms, *b: self.eval_fn(p, ms, *b)
                )
            else:
                self._eval_jit = jax.jit(lambda p, *b: self.eval_fn(p, *b))
        totals, n = {}, 0
        for batch in eval_batches:
            if not isinstance(batch, (tuple, list)):
                batch = (batch,)
            if self.with_model_state:
                val = self._eval_jit(params, state.model_state, *batch)
            else:
                val = self._eval_jit(params, *batch)
            # eval_fn may return a scalar or a {name: scalar} metrics dict;
            # device_get fetches all metrics in ONE round trip (a float()
            # per key would pay the transport RTT per metric per batch)
            vals = val if isinstance(val, dict) else {"eval_loss": val}
            for k, v in jax.device_get(vals).items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        if not totals:
            return 0.0  # no eval batches: keep the scalar contract
        means = {k: v / n for k, v in totals.items()}
        if set(means) == {"eval_loss"}:
            return means["eval_loss"]
        return means

    def fit(
        self,
        state: TrainState,
        batches: Iterable,
        num_steps: Optional[int] = None,
        eval_batches=None,
        resume: bool = False,
    ) -> TrainState:
        """Run the training loop.

        ``resume=True``: restore the latest ``step_XXXXXXXX`` checkpoint
        under ``checkpoint_dir`` (if any) into ``state`` before training
        and continue counting from its step — ``num_steps`` is the TOTAL
        step budget, so a finished run restarts as a no-op.  The batch
        iterator is consumed from its current position (use a stateless
        shuffled stream, e.g. ``batch_iterator(..., epochs=None)``).

        ``batches`` may also be a CALLABLE ``batches(start_step) -> iter``,
        invoked after the (possible) restore with the restored step count;
        pair with ``batch_iterator(..., start_batch=start_step)`` for a
        resumed run that sees the exact data order of an uninterrupted one.

        Preemption: while the loop runs, SIGTERM (what spot/preemptible TPU
        VMs receive before eviction) requests a graceful stop -- the
        in-flight step completes, a checkpoint is written (when
        ``checkpoint_dir`` is set), ``preempted=True`` is logged, and
        ``fit`` returns; rerun with ``resume=True`` to continue.
        """
        # A plain generator would be exhausted by the first evaluation and
        # every later eval would silently report 0.0; materialise it once
        # (pass a callable to re-create batches lazily instead).
        if eval_batches is not None and not callable(eval_batches):
            eval_batches = list(eval_batches)

        if resume and not self.checkpoint_dir:
            raise ValueError(
                "fit(resume=True) needs Trainer(checkpoint_dir=...) --"
                " without it there is nothing to resume from and training"
                " would silently restart at step 0"
            )
        if resume and self.checkpoint_dir:
            from perceiverio_pytorch_tpu.training.checkpoint import (
                latest_checkpoint,
                restore_train_state,
            )

            latest = latest_checkpoint(self.checkpoint_dir)
            if latest is not None:
                state = restore_train_state(latest, state)
                self.logger.log(
                    step=int(state.step),
                    resumed_from=os.path.basename(latest),
                )

        if callable(batches):
            # stream factory: hand it the (restored) step so it can
            # fast-forward (batch_iterator(..., start_batch=step))
            batches = batches(int(state.step))

        group = 1
        if self.mesh is not None:
            step_fn = make_sharded_train_step(
                self.loss_fn, self.tx, self.mesh, state,
                num_batch_args=self.num_batch_args,
                with_model_state=self.with_model_state,
                ema_decay=self.ema_decay,
                with_metrics=self.log_grad_norm,
            )
        elif self.steps_per_call > 1:
            group = self.steps_per_call
            step_fn = make_multi_step(
                self.loss_fn, self.tx,
                with_model_state=self.with_model_state,
                ema_decay=self.ema_decay,
            )
        else:
            step_fn = make_train_step(
                self.loss_fn, self.tx,
                with_model_state=self.with_model_state,
                ema_decay=self.ema_decay,
                with_metrics=self.log_grad_norm,
            )

        if group > 1:
            # num_steps that is not a multiple of the group overruns by at
            # most group-1 updates (inherent to multi-step dispatch).
            batches = _stack_groups(batches, group)

        if self.prefetch > 0:
            from perceiverio_pytorch_tpu.training.data import prefetch_to_device

            sharding = None
            if self.mesh is not None:
                from perceiverio_pytorch_tpu.parallel.sharding import batch_sharding

                sharding = batch_sharding(self.mesh)
            batches = prefetch_to_device(
                batches, self.prefetch, sharding=sharding
            )

        with _PreemptionGuard() as guard:
            state = self._fit_loop(
                state, batches, num_steps, eval_batches, step_fn, group, guard
            )
        return state

    def _fit_loop(
        self, state, batches, num_steps, eval_batches, step_fn, group, guard
    ):
        def _crossed(step_num, prev_step, every):
            return bool(every) and (step_num // every > prev_step // every)

        t0 = time.perf_counter()
        window_start = t0
        step_num = int(state.step)
        window_step = step_num
        start_step = step_num
        last_saved = -1
        for batch in batches:
            if num_steps is not None and step_num >= num_steps:
                break
            if not isinstance(batch, (tuple, list)):
                batch = (batch,)
            state, loss = step_fn(state, *batch)
            prev_step = step_num
            if group > 1:
                step_num += int(batch[0].shape[0])
            else:
                step_num += 1
            if _crossed(step_num, prev_step, self.log_every) or (
                num_steps is not None and step_num >= num_steps
            ):
                # Index the per-step losses only when actually logging: an
                # eager slice on the device array is an extra XLA dispatch
                # per call on the remote transport.
                import jax as _jax

                extra = {}
                if isinstance(loss, dict):  # log_grad_norm metrics
                    # ONE wholesale fetch: a float() per key would pay the
                    # transport round trip per metric (evaluate() batches
                    # the same way)
                    fetched = _jax.device_get(loss)
                    extra = {
                        k: round(float(v), 6)
                        for k, v in fetched.items()
                        if k != "loss"
                    }
                    loss_val = float(fetched["loss"])
                else:
                    if group > 1:
                        loss = loss[-1]
                    loss_val = float(loss)  # host fetch = completion barrier
                now = time.perf_counter()
                if self.lr_schedule is not None:
                    # AFTER the timing capture: optax schedules are jnp
                    # computations, so this is a device dispatch + sync
                    # fetch (~30 ms on the remote transport) that must not
                    # land inside the steps_per_sec window.
                    if self._lr_jit is None:
                        import jax as _jax

                        self._lr_jit = _jax.jit(self.lr_schedule)
                    # step-1: the logged update was taken AT that count
                    extra["lr"] = round(float(self._lr_jit(step_num - 1)), 8)
                self.logger.log(
                    step=int(step_num),
                    loss=loss_val,
                    steps_per_sec=round(
                        (step_num - window_step)
                        / max(now - window_start, 1e-9),
                        3,
                    ),
                    elapsed_sec=round(now - t0, 3),
                    **extra,
                )
                window_start = now
                window_step = step_num
            if (
                self.eval_fn is not None
                and eval_batches is not None
                and _crossed(step_num, prev_step, self.eval_every)
            ):
                ev = self.evaluate(
                    state,
                    eval_batches() if callable(eval_batches) else eval_batches,
                )
                if not isinstance(ev, dict):
                    ev = {"eval_loss": ev}
                self.logger.log(
                    step=int(step_num),
                    **{k: round(v, 6) for k, v in ev.items()},
                )
            if self.checkpoint_dir and _crossed(
                step_num, prev_step, self.checkpoint_every
            ):
                self._save_checkpoint(state, step_num)
                last_saved = step_num
            if self._stop_requested(guard):
                # SIGTERM landed (spot/preemptible eviction): the step that
                # was in flight has completed, so checkpoint it and stop --
                # fit(resume=True) picks up from exactly here.
                if self.checkpoint_dir and last_saved != step_num:
                    self._save_checkpoint(state, step_num)
                    last_saved = step_num
                self.logger.log(step=int(step_num), preempted=True)
                break
        if (
            self.checkpoint_final
            and self.checkpoint_dir
            and last_saved != step_num
            and step_num > start_step
        ):
            self._save_checkpoint(state, step_num)
        if self._async_writer is not None:
            # finalize the in-flight background save AND release the orbax
            # async machinery before returning -- the caller may exit (or
            # restore) immediately after fit(); a later fit() lazily
            # creates a fresh writer
            self._async_writer.close()
            self._async_writer = None
        return state

    def _stop_requested(self, guard) -> bool:
        """Has ANY process been told to stop?

        Per-process SIGTERM delivery is skewed on a pod; a process that
        broke out alone would leave the others blocked in the next step's
        collectives.  Agree on the flag with a tiny all-gather each step
        (scalar over ICI — noise next to a train step) so every process
        breaks at the same step boundary and the collective checkpoint
        save lines up.  Single-process: just the local flag.
        """
        import jax

        if jax.process_count() == 1:
            return guard.requested
        from jax.experimental import multihost_utils
        import numpy as np

        flags = multihost_utils.process_allgather(
            np.asarray([guard.requested])
        )
        return bool(np.asarray(flags).any())

    def _save_checkpoint(self, state, step_num: int) -> None:
        import jax

        from perceiverio_pytorch_tpu.training.checkpoint import (
            AsyncCheckpointWriter,
            prune_checkpoints,
            save_train_state,
        )

        path = os.path.join(self.checkpoint_dir, f"step_{step_num:08d}")
        if self.checkpoint_async:
            if self._async_writer is None:
                self._async_writer = AsyncCheckpointWriter()
            # overwrite=True: a resumed run may reach this step again
            self._async_writer.save_train_state(path, state, overwrite=True)
        else:
            save_train_state(path, state, overwrite=True)
        # the save itself is collective (orbax, all processes); pruning is
        # host filesystem work -- one process only, or N racing rmtrees.
        # With async saves the in-flight directory is unfinalised and newer
        # than every finalised one, so pruning never touches it.
        if self.checkpoint_keep > 0 and jax.process_index() == 0:
            prune_checkpoints(self.checkpoint_dir, self.checkpoint_keep)

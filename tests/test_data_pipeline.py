"""Input pipeline: batch_iterator semantics + prefetch_to_device equivalence.

The reference feeds hand-built tensors (example_*.py); the training input
path here must preserve exact batch order/values while moving the
device_put off the step loop's critical path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from perceiverio_pytorch_tpu.parallel import make_mesh
from perceiverio_pytorch_tpu.parallel.sharding import batch_sharding
from perceiverio_pytorch_tpu.training import (
    Trainer,
    batch_iterator,
    prefetch_to_device,
)


def test_batch_iterator_shapes_and_count():
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    y = np.arange(10, dtype=np.int32)
    batches = list(batch_iterator((x, y), 4))
    assert len(batches) == 2  # drop_remainder drops the tail of 2
    for bx, by in batches:
        assert bx.shape == (4, 3) and by.shape == (4,)
    # order preserved without shuffle
    np.testing.assert_array_equal(batches[0][1], [0, 1, 2, 3])

    tail = list(batch_iterator((x, y), 4, drop_remainder=False))
    assert len(tail) == 3 and tail[-1][0].shape == (2, 3)


def test_batch_iterator_shuffle_deterministic_and_complete():
    x = np.arange(8, dtype=np.int64)
    a = [b[0] for b in batch_iterator((x,), 2, shuffle=True, seed=7)]
    b = [b[0] for b in batch_iterator((x,), 2, shuffle=True, seed=7)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    # a permutation of the data, not a subset
    assert sorted(np.concatenate(a).tolist()) == list(range(8))
    c = [b[0] for b in batch_iterator((x,), 2, shuffle=True, seed=8)]
    assert not np.array_equal(np.concatenate(a), np.concatenate(c))


def test_batch_iterator_epochs_and_validation():
    x = np.arange(4)
    assert len(list(batch_iterator((x,), 2, epochs=3))) == 6
    infinite = batch_iterator((x,), 2, epochs=None)
    assert len([next(infinite) for _ in range(9)]) == 9
    with pytest.raises(ValueError, match="equal length"):
        next(batch_iterator((np.arange(4), np.arange(5)), 2))
    with pytest.raises(ValueError, match="batch_size"):
        next(batch_iterator((x,), 0))


def test_prefetch_matches_plain_iteration():
    rng = np.random.RandomState(0)
    src = [(rng.randn(2, 3).astype(np.float32), rng.randint(0, 5, 2)) for _ in range(7)]
    out = list(prefetch_to_device(iter(src), size=3))
    assert len(out) == len(src)
    for (ex, ey), (gx, gy) in zip(src, out):
        assert isinstance(gx, jax.Array)
        np.testing.assert_array_equal(np.asarray(gx), ex)
        np.testing.assert_array_equal(np.asarray(gy), ey)


def test_prefetch_propagates_source_exception():
    def bad():
        yield (np.zeros(2),)
        raise RuntimeError("source broke")

    it = prefetch_to_device(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="source broke"):
        list(it)


def test_prefetch_lands_on_mesh_data_axis():
    mesh = make_mesh((8, 1))
    sh = batch_sharding(mesh)
    src = [(np.ones((16, 4), np.float32), np.zeros((16,), np.int32))]
    (x, y), = prefetch_to_device(iter(src), sharding=sh)
    assert x.sharding == sh and y.sharding == sh
    assert x.sharding.is_fully_replicated is False


def test_trainer_prefetch_equivalent_to_plain():
    """fit(prefetch=2) must produce the identical final state to prefetch=0."""

    def loss_fn(params, x, y):
        pred = x @ params["w"] + params["b"]
        return jnp.mean((pred - y) ** 2)

    rng = np.random.RandomState(3)
    xs = rng.randn(24, 5).astype(np.float32)
    ys = (xs @ rng.randn(5, 2) + 0.1).astype(np.float32)
    params = {"w": jnp.zeros((5, 2)), "b": jnp.zeros((2,))}

    def run(prefetch):
        trainer = Trainer(loss_fn, optax.sgd(0.05), log_every=100, prefetch=prefetch)
        state = trainer.init_state(jax.tree.map(jnp.array, params))
        batches = batch_iterator((xs, ys), 8, shuffle=True, seed=1, epochs=4)
        return trainer.fit(state, batches, num_steps=12)

    plain, pre = run(0), run(2)
    assert int(plain.step) == int(pre.step) == 12
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        plain.params,
        pre.params,
    )


def test_batch_iterator_start_batch_fast_forwards_exactly():
    """start_batch=k reproduces the tail of the k-batches-consumed stream,
    including across epoch boundaries (per-epoch reshuffles replayed)."""
    rng = np.random.RandomState(7)
    xs = rng.randn(20, 3).astype(np.float32)
    full = list(batch_iterator((xs,), 4, shuffle=True, seed=2, epochs=3))
    assert len(full) == 15
    for k in (0, 3, 5, 7, 12):  # 5 = exactly one epoch; 7 = mid-epoch-2
        tail = list(batch_iterator(
            (xs,), 4, shuffle=True, seed=2, epochs=3, start_batch=k
        ))
        assert len(tail) == len(full) - k
        for a, b in zip(tail, full[k:]):
            np.testing.assert_array_equal(a[0], b[0])


def test_trainer_callable_batches_resume_exact_data_order(tmp_path):
    """fit(batches=callable, resume=True): the factory receives the
    restored step, fast-forwards the shuffled stream, and the resumed run
    matches the uninterrupted control bit-for-bit -- data order included
    (a constant batch would hide ordering bugs; this uses distinct ones)."""
    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(9)
    xs = rng.randn(32, 4).astype(np.float32)
    ys = rng.randn(32, 2).astype(np.float32)
    ckpt_dir = str(tmp_path / "ckpts")

    def stream(start=0):
        return batch_iterator((xs, ys), 8, shuffle=True, seed=3,
                              epochs=None, start_batch=start)

    def make_trainer():
        return Trainer(loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir,
                       checkpoint_every=2, log_every=100)

    t1 = make_trainer()
    s1 = t1.init_state({"w": jnp.zeros((4, 2))})
    t1.fit(s1, stream, num_steps=4)

    t2 = make_trainer()
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    s2 = t2.fit(s2, stream, num_steps=7, resume=True)
    assert int(s2.step) == 7

    t3 = Trainer(loss_fn, optax.sgd(0.1), log_every=100)
    s3 = t3.init_state({"w": jnp.zeros((4, 2))})
    s3 = t3.fit(s3, stream(0), num_steps=7)
    np.testing.assert_array_equal(
        np.asarray(s2.params["w"]), np.asarray(s3.params["w"])
    )


def test_batch_smaller_dataset_fails_loud():
    """n < batch_size with drop_remainder would be an infinite EMPTY
    generator under epochs=None (a hang at the first next()); both
    iterators must raise instead."""
    import numpy as np
    import pytest

    from perceiverio_pytorch_tpu.training import batch_iterator

    with pytest.raises(ValueError, match="yields no batches"):
        next(batch_iterator((np.arange(3),), 8, epochs=None))
    # drop_remainder=False still yields the short batch
    (short,) = next(batch_iterator((np.arange(3),), 8, drop_remainder=False))
    assert short.shape == (3,)

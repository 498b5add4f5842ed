"""End-to-end training demo: image classification with the conv preprocessor.

Exercises the part of the training stack the other demos don't: a model
with non-param state (the Conv2DDownsample BatchNorm EMAs + the "consts"
Fourier tables) carried through the TrainState via ``with_model_state``.
Synthetic task with a known answer: the class is the quadrant holding the
bright patch, so cross-entropy can drive to zero.

Default config is tiny (runs anywhere in seconds).  ``--full-scale``
trains the exact shipped ImageNet conv-prep config
(/root/reference/perceiver_io/classification_perceiver.py:21-131) with
remat and the bf16 PERFORMANCE policy: 87.9 ms/step at the swept-optimal
batch 8 on one v5e chip = 91.1 img/s (PERFORMANCE.md).

    python examples/train_classification.py --steps 30 [--full-scale] [--mesh D M]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu import PERFORMANCE
from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
from perceiverio_pytorch_tpu.training import (
    Trainer,
    build_optimizer,
    classification_cross_entropy,
)
from perceiverio_pytorch_tpu.utils.data import (
    batch_iterator,
    epoch_batches,
    prefetch_to_device,
)


def synthetic_quadrants(n: int, hw, num_classes: int, seed: int = 0):
    """Images whose label is the quadrant containing a bright patch."""
    h, w = hw
    rng = np.random.RandomState(seed)
    img = rng.uniform(-1, 0, (n, 3, h, w)).astype(np.float32)
    labels = rng.randint(0, min(num_classes, 4), n)
    for i, lab in enumerate(labels):
        y0 = (lab // 2) * (h // 2)
        x0 = (lab % 2) * (w // 2)
        img[i, :, y0 : y0 + h // 4, x0 : x0 + w // 4] = 1.0
    return img, labels.astype(np.int32)


def main(steps=30, batch_size=8, full_scale=False, mesh_shape=None, fsdp=False,
         checkpoint_dir=None, resume=False, quant=None, data_dir=None):
    import dataclasses

    from perceiverio_pytorch_tpu import DEFAULT

    # --quant: quantization-aware training (int8 forward, exact STE
    # backward) so the trained weights match an int8 deployment; speed is
    # ~neutral (PERFORMANCE.md item 16 -- QAT is an accuracy workflow).
    def _q(policy):
        return (dataclasses.replace(policy, quant=f"int8_{quant}")
                if quant else policy)

    hw = (224, 224) if full_scale else (32, 32)
    dataset = eval_items = None
    if data_dir is not None:
        # real data: root/<class>/*.png, decoded by a thread pool, shipped
        # uint8 and normalized on device (4x less host->device traffic).
        # The last 2*batch_size images (in the deterministic sorted order)
        # are held out: the Trainer scores eval_loss + eval_top1 on them.
        from perceiverio_pytorch_tpu.training import ImageFolderDataset, Subset

        full = ImageFolderDataset(data_dir, image_size=hw)
        num_classes = len(full.class_names)
        n_eval = min(2 * batch_size, max(len(full) - batch_size, 0))
        dataset = Subset(full, range(len(full) - n_eval))
        if n_eval:
            eval_items = [full[i] for i in
                          range(len(full) - n_eval, len(full))]
        print(f"{len(full)} images, {num_classes} classes from {data_dir}"
              f" ({len(dataset)} train / {n_eval} eval)")
    else:
        num_classes = 1000 if full_scale else 4

    if full_scale:
        model = ClassificationPerceiver(
            num_classes=num_classes, policy=_q(PERFORMANCE), remat=True)
    else:
        model = ClassificationPerceiver(
            num_classes=num_classes, img_size=hw, num_latents=32,
            num_latent_channels=128, num_self_attends_per_block=2,
            num_blocks=1, prep_type=PrepType.FOURIER_POS_CONVNET,
            policy=_q(DEFAULT),
        )

    def _prep(img):
        """uint8 [B,C,H,W] -> normalized float (on device, inside the jit)."""
        img = img.astype(jnp.float32)
        if dataset is not None:
            from perceiverio_pytorch_tpu.utils.image import normalize_imagenet

            img = normalize_imagenet(img)
        return img

    if dataset is not None:
        from perceiverio_pytorch_tpu.training import dataset_iterator

        img = next(dataset_iterator(dataset, batch_size, num_workers=0))[0]
        labels = None
    else:
        img, labels = synthetic_quadrants(8 * batch_size, hw, num_classes)
    variables = jax.jit(lambda k, x: model.init(k, _prep(x)))(
        jax.random.PRNGKey(0), img[:batch_size])
    # Non-param collections (batch_stats EMA + immutable "consts" Fourier
    # tables) ride in TrainState.model_state; the loss threads them through
    # a mutable apply and merges the mutated subset back.
    aux = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, model_state, img, labels):
        logits, mutated = model.apply(
            {"params": params, **model_state}, _prep(img),
            deterministic=False, mutable=["batch_stats"],
        )
        return classification_cross_entropy(logits, labels), {
            **model_state, **mutated,
        }

    def eval_fn(params, model_state, img, labels):
        # inference pathway: BN uses the EMA stats, no mutation
        logits = model.apply({"params": params, **model_state}, _prep(img))
        return {
            "eval_loss": classification_cross_entropy(logits, labels),
            "eval_top1": jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            ),
        }

    mesh = None
    if mesh_shape is not None:
        from perceiverio_pytorch_tpu.parallel import make_mesh

        mesh = make_mesh(tuple(mesh_shape))

    trainer = Trainer(
        loss_fn,
        build_optimizer(
            1e-4 if full_scale else 1e-3, schedule="cosine",
            total_steps=steps, warmup_steps=max(steps // 10, 1),
            clip_norm=1.0,
        ),
        mesh=mesh,
        fsdp=fsdp,  # ZeRO-3: weights + moments 1/data per replica
        num_batch_args=2,
        with_model_state=True,
        metrics_path="./classification_metrics.jsonl",
        log_every=10,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=0 if checkpoint_dir is None else max(steps // 2, 1),
        eval_fn=None if eval_items is None else eval_fn,
        eval_every=max(steps // 2, 1),
    )
    state = trainer.init_state(variables["params"], model_state=aux)
    eval_batches = None
    if eval_items is not None:
        fields = tuple(np.stack(f) for f in zip(*eval_items))
        eval_batches = list(epoch_batches(fields, batch_size, shuffle=False,
                                          drop_remainder=False))

    # epochs=None reshuffles every epoch (a fresh epoch_batches() per
    # loop iteration would replay the same seed-0 permutation)
    def batches(start_step=0):
        if dataset is not None:
            from perceiverio_pytorch_tpu.training import dataset_iterator

            return dataset_iterator(dataset, batch_size, shuffle=True,
                                    epochs=None, start_batch=start_step,
                                    num_workers=4)
        return batch_iterator((img, labels), batch_size,
                              shuffle=True, epochs=None,
                              start_batch=start_step)

    state = trainer.fit(
        state, lambda s: prefetch_to_device(batches(s), 2),
        num_steps=steps, eval_batches=eval_batches, resume=resume,
    )
    print(f"finished at step {int(state.step)}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--full-scale", action="store_true",
                        help="exact shipped ImageNet conv-prep config")
    parser.add_argument("--mesh", type=int, nargs=2, default=None,
                        help="(data, model) mesh shape")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3: shard weights + optimizer moments over the data axis")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the newest checkpoint in --checkpoint-dir")
    parser.add_argument("--quant", nargs="?", const="dynamic", default=None,
                        choices=["dynamic"],
                        help="QAT: int8 forward + exact (STE) backward, so"
                             " training matches an int8_dynamic deployment")
    parser.add_argument("--data-dir", default=None,
                        help="train on a real root/<class>/*.png image tree"
                             " (threaded decode, uint8 to device, normalize"
                             " on device) instead of the synthetic set")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(args.steps, args.batch_size, full_scale=args.full_scale,
         mesh_shape=args.mesh, fsdp=args.fsdp,
         checkpoint_dir=args.checkpoint_dir,
         resume=args.resume, quant=args.quant, data_dir=args.data_dir)

"""End-to-end training demo: optical flow on synthetic data.

Trains FlowPerceiver with the production training stack (Trainer loop,
warmup+cosine optimizer, JSONL metrics, prefetched batches, optional mesh
sharding, orbax checkpoints) on a synthetic task with a known answer:
frame 2 is frame 1 rolled by a per-sample integer shift, so the ground
truth is a constant flow field the endpoint-error loss can drive to zero.

Default config is tiny (runs anywhere in seconds).  ``--full-scale``
trains the exact shipped 368x496 config (2048x512 latents, 24 layers --
/root/reference/perceiver_io/flow_perceiver.py:34-42) with remat and the
bf16 PERFORMANCE policy: ~108 ms/step at batch 1 on one v5e chip
(PERFORMANCE.md).

    python examples/train_flow.py --steps 30 [--full-scale] [--mesh D M]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu import PERFORMANCE
from perceiverio_pytorch_tpu.models import FlowPerceiver
from perceiverio_pytorch_tpu.training import (
    Trainer,
    build_optimizer,
    flow_endpoint_error,
)
from perceiverio_pytorch_tpu.utils.data import (
    batch_iterator,
    epoch_batches,
    prefetch_to_device,
)


def synthetic_flow_pairs(n: int, hw, max_shift: int = 3, seed: int = 0):
    """Frame pairs related by a per-sample integer roll + the exact flow."""
    h, w = hw
    rng = np.random.RandomState(seed)
    # smooth-ish frames: low-res noise upsampled, so the 3x3 patch context
    # around each pixel identifies the shift
    base = rng.uniform(-1, 1, (n, 3, max(h // 4, 1), max(w // 4, 1)))
    img1 = np.stack(
        [np.kron(b, np.ones((4, 4)))[:, :h, :w] for b in base]
    ).astype(np.float32)
    shifts = rng.randint(-max_shift, max_shift + 1, (n, 2))
    img2 = np.stack(
        [np.roll(im, (dy, dx), axis=(1, 2)) for im, (dy, dx) in zip(img1, shifts)]
    )
    # flow convention matches FlowPostprocessor: channel 0 = horizontal (x),
    # channel 1 = vertical (y) displacement from frame 1 to frame 2
    flow = np.zeros((n, 2, h, w), np.float32)
    flow[:, 0] = shifts[:, 1][:, None, None]
    flow[:, 1] = shifts[:, 0][:, None, None]
    return img1, img2, flow


def main(steps=30, batch_size=None, full_scale=False, mesh_shape=None, fsdp=False,
         checkpoint_dir=None, resume=False, pp_stages=0, pp_microbatches=2,
         pp_circ_repeats=1, data_dir=None, augment=True):
    import dataclasses

    # --pp-stages: pipeline the 24-layer latent stack over a "pipe" mesh
    # axis (flow is THE deep distinct-layer pp target --
    # flow_perceiver.py:34-42); --pp-circ-repeats > 1 uses the circular
    # (interleaved) schedule for a v-fold smaller pipeline bubble.
    policy = PERFORMANCE if full_scale else None
    if pp_stages > 1:
        from perceiverio_pytorch_tpu import DEFAULT
        from perceiverio_pytorch_tpu.parallel import make_pipeline_mesh

        pp_mesh = make_pipeline_mesh(pp_stages)
        policy = dataclasses.replace(
            policy or DEFAULT, pp_mesh=pp_mesh,
            pp_microbatches=pp_microbatches,
            pp_circ_repeats=pp_circ_repeats,
        )
    if full_scale:
        model = FlowPerceiver(policy=policy, remat=True)
        if batch_size not in (None, 1):
            print(f"--full-scale forces batch_size=1 (requested {batch_size})")
        hw, batch_size = (368, 496), 1
    else:
        batch_size = 2 if batch_size is None else batch_size
        kwargs = {} if policy is None else {"policy": policy}
        model = FlowPerceiver(
            img_size=(32, 48), num_latents=64, num_latent_channels=128,
            num_self_attends_per_block=2 if pp_stages <= 1 else 2 * pp_stages,
            **kwargs,
        )
        hw = (32, 48)

    dataset = eval_items = None
    if data_dir is not None:
        # real data: Sintel-style frames/ + flow/ scene tree(s), cropped to
        # the model grid (crops preserve flow values; resizes would not),
        # frames shipped uint8 and normalized on device.  The last
        # 2*batch_size pairs (center-cropped, no augmentation) are held
        # out: the Trainer scores eval AEPE on them.
        from perceiverio_pytorch_tpu.training import (
            FlowPairDataset,
            Subset,
            dataset_iterator,
        )

        full = FlowPairDataset(data_dir, crop_size=hw, augment=augment)
        n_eval = min(2 * batch_size, max(len(full) - batch_size, 0))
        dataset = Subset(full, range(len(full) - n_eval))
        if n_eval:
            center = FlowPairDataset(data_dir, crop_size=hw, augment=False)
            eval_items = [center[i] for i in
                          range(len(center) - n_eval, len(center))]
        print(f"{len(full)} frame pairs from {data_dir}"
              f" ({len(dataset)} train / {n_eval} eval)")
        img1, img2, flow = next(dataset_iterator(dataset, batch_size,
                                                 num_workers=0))
    else:
        img1, img2, flow = synthetic_flow_pairs(8 * batch_size, hw)

    def _prep(img):
        """uint8 [B,3,H,W] -> [-1, 1] float (on device, inside the jit)."""
        if img.dtype == jnp.uint8:
            return 2.0 * (img.astype(jnp.float32) / 255.0) - 1.0
        return img

    variables = jax.jit(lambda k, a, b: model.init(k, _prep(a), _prep(b)))(
        jax.random.PRNGKey(0), img1[:batch_size], img2[:batch_size]
    )
    # Split the derived Fourier tables ("consts") out of the trainable
    # params: they are pure functions of the config -- training them would
    # waste adamw moments on the table and dominate the global-norm clip.
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, model_state, a, b, gt):
        out = model.apply({"params": params, **model_state}, _prep(a),
                          _prep(b))
        return flow_endpoint_error(out, gt), model_state

    def eval_fn(params, model_state, a, b, gt):
        out = model.apply({"params": params, **model_state}, _prep(a),
                          _prep(b))
        return {"eval_epe": flow_endpoint_error(out, gt)}

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
        num_batch_args=3,
        with_model_state=True,
        metrics_path="./flow_metrics.jsonl",
        log_every=10,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=0 if checkpoint_dir is None else max(steps // 2, 1),
        eval_fn=None if eval_items is None else eval_fn,
        eval_every=max(steps // 2, 1),
    )
    state = trainer.init_state(variables["params"], model_state=consts)
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
        return batch_iterator((img1, img2, flow), batch_size,
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
    parser.add_argument("--batch-size", type=int, default=None,
                        help="default 2 (tiny); --full-scale forces 1")
    parser.add_argument("--full-scale", action="store_true",
                        help="exact shipped 368x496 config, remat + bf16")
    parser.add_argument("--mesh", type=int, nargs=2, default=None,
                        help="(data, model) mesh shape")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3: shard weights + optimizer moments over the data axis")
    parser.add_argument("--pp-stages", type=int, default=0,
                        help="pipeline the latent stack over this many"
                             " devices (Policy.pp_mesh; needs that many"
                             " devices; batch must divide"
                             " --pp-microbatches)")
    parser.add_argument("--pp-microbatches", type=int, default=2)
    parser.add_argument("--pp-circ-repeats", type=int, default=1,
                        help="> 1: circular (interleaved) schedule with"
                             " this many layer groups per device")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the newest checkpoint in --checkpoint-dir")
    parser.add_argument("--data-dir", default=None,
                        help="Sintel-style scene tree (frames/ + flow/);"
                             " default: synthetic roll pairs")
    parser.add_argument("--no-augment", action="store_true",
                        help="center-crop instead of random-crop --data-dir"
                             " frames")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(args.steps, args.batch_size, full_scale=args.full_scale,
         mesh_shape=args.mesh, fsdp=args.fsdp,
         checkpoint_dir=args.checkpoint_dir, resume=args.resume,
         pp_stages=args.pp_stages, pp_microbatches=args.pp_microbatches,
         pp_circ_repeats=args.pp_circ_repeats, data_dir=args.data_dir,
         augment=not args.no_augment)

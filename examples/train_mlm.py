"""End-to-end training demo: byte-MLM on synthetic data.

Shows the full training stack: Trainer loop, JSONL metrics, prefetched
batches, optional mesh sharding, orbax checkpoints.  Synthetic corpus
(random byte strings with a learnable marker pattern) so it runs anywhere.

    python examples/train_mlm.py --steps 50 [--full-scale] [--mesh DATA MODEL]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.models import LanguagePerceiver
from perceiverio_pytorch_tpu.training import (
    Trainer,
    build_optimizer,
    masked_token_cross_entropy,
)
from perceiverio_pytorch_tpu.utils.data import (
    batch_iterator,
    epoch_batches,
    prefetch_to_device,
)


def synthetic_corpus(n: int, seq_len: int, vocab: int, seed: int = 0):
    """Corpus + MLM corruption: 15% of positions are replaced by MASK (=3,
    utils.bytes_tokenizer reserved id) and the loss is computed on exactly
    those positions against the original tokens -- real masked-token
    prediction, not visible-copy reconstruction."""
    rng = np.random.RandomState(seed)
    tokens = rng.randint(6, vocab, (n, seq_len)).astype(np.int32)
    # plant a learnable regularity: every 8th token repeats its predecessor
    tokens[:, 7::8] = tokens[:, 6::8]
    mlm_mask = rng.rand(n, seq_len) < 0.15
    corrupted = np.where(mlm_mask, 3, tokens).astype(np.int32)
    return corrupted, tokens, mlm_mask


def main(steps: int = 50, batch_size: int = 8, seq_len: int = None,
         mesh_shape=None, checkpoint_dir=None, steps_per_call: int = 1,
         full_scale: bool = False, resume=False, quant=None,
         async_checkpoint: bool = False, fsdp: bool = False,
         lora_rank: int = 0, text_file=None, mask_rate: float = 0.15):
    import dataclasses

    from perceiverio_pytorch_tpu import DEFAULT, PERFORMANCE

    # --quant: quantization-aware training -- the forward runs the int8
    # GEMMs the deployed model will run (dynamic scales; per-token), the
    # backward stays exact (straight-through estimator).  Speed-neutral
    # (PERFORMANCE.md item 16); this is an accuracy workflow for int8
    # deployment, not a training-throughput lever.
    if full_scale:
        # Exact shipped config (language_perceiver.py: 2048 tokens, 26
        # layers, 256x1280 latents): 28.8 ms/step at batch 8 on one v5e
        # chip (PERFORMANCE.md).
        if seq_len not in (None, 2048):
            print(f"--full-scale forces seq_len=2048 (requested {seq_len})")
        seq_len = 2048
        policy = PERFORMANCE
    else:
        seq_len = 256 if seq_len is None else seq_len
        policy = DEFAULT
    if quant:
        policy = dataclasses.replace(policy, quant=f"int8_{quant}")
    if full_scale:
        model = LanguagePerceiver(policy=policy)
    else:
        model = LanguagePerceiver(
            max_seq_len=seq_len, embed_dim=64, num_self_attends_per_block=4,
            num_latents=64, num_latent_channels=256, policy=policy,
        )
    dataset = None
    if text_file is not None:
        # real corpus: byte-token windows (a path or a glob) with static
        # MLM corruption -- the reference example's masking protocol at
        # dataset scale.  The last 2*batch_size windows are held out for
        # eval (corrupted with a different seed).
        from perceiverio_pytorch_tpu.training import (
            MLMDataset,
            Subset,
            TextFileDataset,
            dataset_iterator,
        )

        windows = TextFileDataset(text_file, seq_len=seq_len)
        n_eval = min(2 * batch_size, max(len(windows) - batch_size, 0))
        dataset = MLMDataset(Subset(windows, range(len(windows) - n_eval)),
                             mask_rate=mask_rate)
        print(f"{len(windows)} windows of {seq_len} tokens from {text_file}"
              f" ({len(dataset)} train / {n_eval} eval)")
        corrupted, targets, mlm_mask = next(
            dataset_iterator(dataset, batch_size, num_workers=0)
        )
        if n_eval:
            eval_ds = MLMDataset(
                Subset(windows,
                       range(len(windows) - n_eval, len(windows))),
                mask_rate=mask_rate, seed=1,
            )
            eval_c, eval_t, eval_m = (
                np.stack(f)
                for f in zip(*[eval_ds[i] for i in range(n_eval)])
            )
        else:
            eval_c, eval_t, eval_m = corrupted, targets, mlm_mask
    else:
        corrupted, targets, mlm_mask = synthetic_corpus(1024, seq_len, 262)
        eval_c, eval_t, eval_m = synthetic_corpus(
            2 * batch_size, seq_len, 262, seed=1
        )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(corrupted[:batch_size]),
        jnp.ones((batch_size, seq_len), bool),
    )

    def loss_fn(params, corrupted, targets, mlm_mask):
        # input mask = all valid (no padding); the MLM mask selects which
        # positions count toward the loss
        logits = model.apply(
            params, corrupted, jnp.ones_like(corrupted, bool),
            deterministic=False,
        )
        return masked_token_cross_entropy(logits, targets, mlm_mask)

    def eval_fn(params, corrupted, targets, mlm_mask):
        logits = model.apply(params, corrupted, jnp.ones_like(corrupted, bool))
        return masked_token_cross_entropy(logits, targets, mlm_mask)

    if lora_rank:
        # Parameter-efficient fine-tuning: freeze the (here: freshly
        # initialised; in production: pretrained .pth-converted) weights and
        # train rank-r adapters on the attention/MLP kernels only.  The
        # adapter tree becomes the TrainState params; optimizer state is
        # adapter-sized.
        from perceiverio_pytorch_tpu.training import init_lora, wrap_loss

        base_vars = params
        lora = init_lora(jax.random.PRNGKey(1), base_vars["params"],
                         rank=lora_rank)

        def _with_merged(fn):
            from perceiverio_pytorch_tpu.training import merge_lora

            def lifted(lora_tree, *batch):
                merged = dict(base_vars)
                merged["params"] = merge_lora(base_vars["params"], lora_tree)
                return fn(merged, *batch)

            return lifted

        loss_fn, eval_fn = _with_merged(loss_fn), _with_merged(eval_fn)
        params = lora
        n = sum(x.size for x in jax.tree_util.tree_leaves(lora))
        n_base = sum(x.size for x in jax.tree_util.tree_leaves(base_vars))
        print(f"LoRA rank {lora_rank}: training {n:,} adapter params"
              f" ({100.0 * n / n_base:.2f}% of {n_base:,})")

    mesh = None
    if mesh_shape is not None:
        from perceiverio_pytorch_tpu.parallel import make_mesh

        mesh = make_mesh(tuple(mesh_shape))

    trainer = Trainer(
        loss_fn,
        # warmup + cosine decay, global-norm clipping: the production recipe
        build_optimizer(
            3e-4, schedule="cosine", total_steps=steps,
            warmup_steps=max(steps // 10, 1), clip_norm=1.0,
        ),
        mesh=mesh,
        fsdp=fsdp,  # ZeRO-3: weights + moments 1/data per replica
        num_batch_args=3,
        metrics_path="./mlm_metrics.jsonl",
        log_every=10,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=0 if checkpoint_dir is None else max(steps // 2, 1),
        # background checkpoint writes overlapping the following steps
        checkpoint_async=async_checkpoint,
        eval_fn=eval_fn,
        eval_every=max(steps // 2, 1),
        # >1 scans several optimizer updates per device dispatch
        # (training.make_multi_step); single-device path only.
        steps_per_call=steps_per_call,
    )
    state = trainer.init_state(params)
    eval_batches = list(epoch_batches((eval_c, eval_t, eval_m), batch_size))

    # epochs=None reshuffles every epoch (a fresh epoch_batches() per
    # loop iteration would replay the same seed-0 permutation);
    # start_batch fast-forwards a resumed run to the exact data position
    # an uninterrupted run would be at (fit passes the restored step)
    def batches(start_step=0):
        if dataset is not None:
            from perceiverio_pytorch_tpu.training import dataset_iterator

            return dataset_iterator(dataset, batch_size, shuffle=True,
                                    epochs=None, start_batch=start_step,
                                    num_workers=4)
        return batch_iterator((corrupted, targets, mlm_mask), batch_size,
                              shuffle=True, epochs=None,
                              start_batch=start_step)

    state = trainer.fit(
        state, lambda s: prefetch_to_device(batches(s), 2), num_steps=steps,
        eval_batches=eval_batches, resume=resume,
    )
    print(f"finished at step {int(state.step)}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--mesh", type=int, nargs=2, default=None,
                        help="(data, model) mesh shape")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3: shard weights + optimizer moments over the data axis")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--steps-per-call", type=int, default=1)
    parser.add_argument("--full-scale", action="store_true",
                        help="exact shipped 2048-token config, bf16")
    parser.add_argument("--quant", nargs="?", const="dynamic", default=None,
                        choices=["dynamic"],
                        help="QAT: int8 forward + exact (STE) backward, so"
                             " training matches an int8_dynamic deployment")
    parser.add_argument("--lora", type=int, default=0, metavar="RANK",
                        help="freeze the model; train rank-R LoRA adapters"
                             " on the attention/MLP kernels instead")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the newest checkpoint in --checkpoint-dir")
    parser.add_argument("--text-file", default=None,
                        help="UTF-8 corpus path or glob (byte-token"
                             " windows); default: synthetic corpus")
    parser.add_argument("--mask-rate", type=float, default=0.15,
                        help="--text-file MLM corruption rate")
    parser.add_argument("--async-checkpoint", action="store_true",
                        help="write checkpoints in the background (Trainer(checkpoint_async=True))")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(args.steps, args.batch_size, mesh_shape=args.mesh,
         checkpoint_dir=args.checkpoint_dir,
         steps_per_call=args.steps_per_call,
         full_scale=args.full_scale, resume=args.resume, quant=args.quant,
         async_checkpoint=args.async_checkpoint, fsdp=args.fsdp,
         lora_rank=args.lora, text_file=args.text_file,
         mask_rate=args.mask_rate)

"""Masked-LM evaluation: masked-token accuracy + cross-entropy over text.

Chunks a UTF-8 text file into byte sequences, masks a fixed set of
positions per batch (deterministic in --seed), and scores the model's
predictions at exactly those positions.  Decoding uses
``LanguagePerceiver(predict_positions=...)`` -- only the masked rows of the
2048-query decode are computed (exact; the reference always pays the full
decode).

    python examples/evaluate_mlm.py [--text-file corpus.txt]
        [--checkpoint ckpt | --torch-checkpoint language_perceiver_io_bytes.pth]
        [--full-scale] [--mask-rate 0.15]

Prints one JSON line: masked_accuracy, masked_ce, sequences, seq/s.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu import PERFORMANCE
from perceiverio_pytorch_tpu.models import LanguagePerceiver
from perceiverio_pytorch_tpu.utils.bytes_tokenizer import BytesTokenizer

_DEMO_TEXT = (
    "This is an incomplete sentence where some words are missing from the "
    "middle and the model is asked to reconstruct the deleted bytes. "
) * 64

MASK_TOKEN = 3  # utils/bytes_tokenizer reserved id, matches the reference


def _chunks(text: str, seq_len: int, tokenizer: BytesTokenizer):
    ids = tokenizer.to_int(text)
    n = (len(ids) // seq_len) * seq_len
    if n == 0:
        raise ValueError(
            f"text too short: {len(ids)} tokens < seq_len {seq_len}"
        )
    return np.asarray(ids[:n], np.int32).reshape(-1, seq_len)


def main(text_file=None, checkpoint=None, torch_checkpoint=None,
         full_scale=False, batch_size=8, mask_rate=0.15, seed=0,
         limit=None, partial_decode=True, quant=None):
    import dataclasses

    from perceiverio_pytorch_tpu import Policy

    policy = PERFORMANCE if full_scale else Policy()
    if quant:
        policy = dataclasses.replace(policy, quant=f"int8_{quant}")
    if full_scale:
        model = LanguagePerceiver(policy=policy)
        seq_len = 2048
    else:
        model = LanguagePerceiver(
            max_seq_len=256, embed_dim=64, num_self_attends_per_block=4,
            num_latents=64, num_latent_channels=256, policy=policy,
        )
        seq_len = 256

    tokenizer = BytesTokenizer()
    text = open(text_file).read() if text_file else _DEMO_TEXT
    seqs = _chunks(text, seq_len, tokenizer)

    example = jnp.zeros((batch_size, seq_len), jnp.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), example, jnp.ones_like(example, bool)
    )
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_eval_variables,
    )

    variables = restore_eval_variables(variables, checkpoint, torch_checkpoint)

    n_masked = max(1, int(round(mask_rate * seq_len)))

    if quant == "static":
        # PTQ calibration: fill each int8 site's max|x| from one
        # representative (corrupted) batch before scoring -- restored
        # checkpoints carry no useful quant_stats (ops.quant.calibrate;
        # same recipe as evaluate_classification / serve.py).
        from perceiverio_pytorch_tpu.ops.quant import calibrate

        calib_tokens = np.array(seqs[:batch_size])
        calib_pos = np.random.RandomState(seed).choice(
            seq_len, n_masked, replace=False
        )
        calib_tokens[:, calib_pos] = MASK_TOKEN
        variables = calibrate(
            model, variables,
            [(jnp.asarray(calib_tokens),
              jnp.ones((len(calib_tokens), seq_len), bool))],
        )

    if partial_decode:

        def scores(v, tokens, positions):
            corrupted = tokens.at[:, positions].set(MASK_TOKEN)
            logits = model.apply(v, corrupted,
                                 jnp.ones_like(corrupted, bool),
                                 predict_positions=positions)
            return logits  # [B, P, vocab]

    else:

        def scores(v, tokens, positions):
            corrupted = tokens.at[:, positions].set(MASK_TOKEN)
            logits = model.apply(v, corrupted,
                                 jnp.ones_like(corrupted, bool))
            return jnp.take(logits, positions, axis=1)

    step = jax.jit(scores)

    rng = np.random.RandomState(seed)
    correct = total = 0
    ce_sum = 0.0
    n_seqs = 0
    t0, timed = None, 0
    for start in range(0, (len(seqs) // batch_size) * batch_size, batch_size):
        tokens = jnp.asarray(seqs[start : start + batch_size])
        # one fixed position set per batch (static P under jit)
        positions = jnp.asarray(
            np.sort(rng.choice(seq_len, n_masked, replace=False)))
        logits = step(variables, tokens, positions)
        gold = np.asarray(tokens)[:, np.asarray(positions)]
        logits = np.asarray(logits, np.float32)
        if t0 is None:
            t0 = time.perf_counter()
        else:
            timed += batch_size
        pred = logits.argmax(-1)
        correct += int((pred == gold).sum())
        total += gold.size
        lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1))
        ce_sum += float(
            (lse - np.take_along_axis(
                logits - logits.max(-1, keepdims=True), gold[..., None], -1
            )[..., 0]).sum()
        )
        n_seqs += batch_size
        if limit and n_seqs >= limit:
            break
    elapsed = time.perf_counter() - t0 if t0 else 0.0
    result = {
        "sequences": n_seqs,
        "masked_tokens": total,
        "masked_accuracy": round(correct / max(total, 1), 4),
        "masked_ce": round(ce_sum / max(total, 1), 4),
        "seq_per_sec": round(timed / elapsed, 1)
        if timed and elapsed > 0 else None,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--text-file", default=None,
                        help="UTF-8 corpus (default: a built-in demo text)")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--torch-checkpoint", default=None)
    parser.add_argument("--full-scale", action="store_true",
                        help="exact shipped 2048-token config")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--mask-rate", type=float, default=0.15)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--full-decode", action="store_true",
                        help="decode all positions instead of only the"
                             " masked ones (same numbers, more FLOPs)")
    parser.add_argument("--quant", nargs="?", const="dynamic", default=None,
                        choices=["dynamic", "static"],
                        help="int8 projections (static calibrates on the"
                             " first batch); use to measure the PTQ"
                             " accuracy delta vs the exact run")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(text_file=args.text_file, checkpoint=args.checkpoint,
         torch_checkpoint=args.torch_checkpoint, full_scale=args.full_scale,
         batch_size=args.batch_size, mask_rate=args.mask_rate,
         seed=args.seed, limit=args.limit,
         partial_decode=not args.full_decode, quant=args.quant)

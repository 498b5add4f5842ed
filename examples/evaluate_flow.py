"""Flow evaluation: AEPE / accuracy over frame pairs with .flo ground truth.

Sintel-style layout (any sizes; FlowInference tiles + blends arbitrary
resolutions):

    data_dir/
      frames/  frame_0001.png frame_0002.png ...   (consecutive)
      flow/    frame_0001.flo ...                  (gt for pair i, i+1)

    python examples/evaluate_flow.py --data-dir /data/sintel/alley_1 \\
        [--torch-checkpoint flow.pth | --checkpoint ckpt | random init]

Prints one JSON line: AEPE, 1/3/5-px accuracy, Fl outliers, pairs/sec.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu import PERFORMANCE
from perceiverio_pytorch_tpu.models import FlowInference, FlowPerceiver
from perceiverio_pytorch_tpu.utils.flow_io import flow_error_stats, read_flo
from perceiverio_pytorch_tpu.utils.image import load_image


def _pairs(data_dir):
    frames = sorted(glob.glob(os.path.join(data_dir, "frames", "*.png")))
    if len(frames) < 2:
        raise ValueError(f"need >= 2 frames under {data_dir}/frames")
    for a, b in zip(frames, frames[1:]):
        stem = os.path.splitext(os.path.basename(a))[0]
        gt = os.path.join(data_dir, "flow", stem + ".flo")
        yield a, b, (gt if os.path.exists(gt) else None)


def main(data_dir, checkpoint=None, torch_checkpoint=None, small=False,
         limit=None, min_overlap=20, wave_size=0):
    if small:
        # tiny config for demos/smoke tests (random weights, real pipeline)
        model = FlowPerceiver(
            img_size=(64, 96), num_latents=32, num_latent_channels=64,
            num_self_attends_per_block=2,
        )
    else:
        model = FlowPerceiver(policy=PERFORMANCE)

    first = next(iter(_pairs(data_dir)))
    img = load_image(first[0])  # [1, C, H, W] in [0, 255]
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3) + model.img_size, jnp.float32),
        jnp.zeros((1, 3) + model.img_size, jnp.float32),
    )
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_eval_variables,
    )

    variables = restore_eval_variables(variables, checkpoint, torch_checkpoint)

    infer = FlowInference(model, variables, min_overlap=min_overlap,
                          wave_size=wave_size)

    totals, n_pairs, n_px = {}, 0, 0
    t0 = None
    for f1, f2, gt_path in _pairs(data_dir):
        a = jnp.asarray(2.0 * (load_image(f1) / 255.0) - 1.0)
        b = jnp.asarray(2.0 * (load_image(f2) / 255.0) - 1.0)
        flow = np.asarray(infer(a, b, test_mode=True))[0]  # [2, H, W]
        if t0 is None:
            t0 = time.perf_counter()  # exclude the compile
            t0_pairs = 0
        else:
            t0_pairs += 1
        if gt_path is not None:
            stats = flow_error_stats(flow, read_flo(gt_path))
            w = stats.pop("pixels")
            n_px += w
            for k, v in stats.items():
                totals[k] = totals.get(k, 0.0) + v * w
        n_pairs += 1
        if limit and n_pairs >= limit:
            break
    elapsed = time.perf_counter() - t0 if t0 else 0.0
    result = {"pairs": n_pairs}
    if n_px:
        result.update({k: round(v / n_px, 4) for k, v in totals.items()})
    else:
        result["note"] = "no .flo ground truth found; timing only"
    if t0_pairs and elapsed > 0:
        result["pairs_per_sec"] = round(t0_pairs / elapsed, 2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True,
                        help="directory with frames/*.png and flow/*.flo")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax variables dir or Trainer checkpoint")
    parser.add_argument("--torch-checkpoint", default=None,
                        help="reference-convention .pth (sintel.pth)")
    parser.add_argument("--small", action="store_true",
                        help="tiny random-weight config (pipeline demo)")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--min-overlap", type=int, default=20)
    parser.add_argument("--wave-size", type=int, default=0,
                        help="tile-wave scan size (HBM bound for huge grids)")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(args.data_dir, checkpoint=args.checkpoint,
         torch_checkpoint=args.torch_checkpoint, small=args.small,
         limit=args.limit, min_overlap=args.min_overlap,
         wave_size=args.wave_size)

"""Offline evaluation: top-1 / top-5 accuracy over an image-folder dataset.

Completes the data -> train -> evaluate -> serve loop: point it at a
``root/<class>/*.png`` tree (e.g. an ImageNet val split arranged by class)
and a checkpoint, get accuracy + throughput as one JSON line.

    python examples/evaluate_classification.py --data-dir /data/val \\
        [--checkpoint ckpt_dir | --torch-checkpoint model.pth | --random-init]
        [--full-scale] [--mesh N] [--quant static]

Images ship uint8 and are normalized on device (4x less transfer on this
transport); decode runs in a thread pool (training.dataset_iterator).
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

from perceiverio_pytorch_tpu import DEFAULT, PERFORMANCE
from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
from perceiverio_pytorch_tpu.training import ImageFolderDataset, dataset_iterator
from perceiverio_pytorch_tpu.utils.image import normalize_imagenet
from perceiverio_pytorch_tpu.utils.params import cast_variables_for_inference


def main(data_dir=None, checkpoint=None, torch_checkpoint=None,
         batch_size=16, full_scale=False, mesh_devices=None, quant=None,
         limit=None):
    import dataclasses

    hw = (224, 224) if full_scale else (32, 32)
    if data_dir is not None:
        dataset = ImageFolderDataset(data_dir, image_size=hw)
        num_classes = len(dataset.class_names)
    else:
        # synthetic demo set: class = brightest RGB channel
        rng = np.random.RandomState(0)
        num_classes = 3
        imgs = (rng.rand(8 * batch_size, 3, *hw) * 60).astype(np.uint8)
        labels = rng.randint(0, 3, len(imgs))
        for i, l in enumerate(labels):
            imgs[i, l] = np.clip(imgs[i, l].astype(np.int32) + 160, 0, 255)

        class _Synth:
            class_names = ["r", "g", "b"]

            def __len__(self):
                return len(imgs)

            def __getitem__(self, i):
                return imgs[i], np.asarray(labels[i], np.int32)

        dataset = _Synth()

    policy = PERFORMANCE if full_scale else DEFAULT
    if quant:
        policy = dataclasses.replace(policy, quant=f"int8_{quant}")
    if full_scale:
        model = ClassificationPerceiver(num_classes=num_classes, policy=policy)
    else:
        model = ClassificationPerceiver(
            num_classes=num_classes, img_size=hw, num_latents=32,
            num_latent_channels=128, num_self_attends_per_block=2,
            num_blocks=1, prep_type=PrepType.FOURIER_POS_CONVNET,
            policy=policy,
        )

    example = jnp.zeros((batch_size, 3, *hw), jnp.uint8)
    variables = jax.jit(
        lambda k, x: model.init(k, normalize_imagenet(x.astype(jnp.float32)))
    )(jax.random.PRNGKey(0), example)

    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_eval_variables,
    )

    variables = restore_eval_variables(variables, checkpoint, torch_checkpoint)
    if full_scale and not quant:
        variables = cast_variables_for_inference(variables)

    if quant == "static":
        # PTQ calibration: restored checkpoints carry no useful quant_stats
        # (and init saw a zeros example), so fill each site's max|x| from
        # the first few evaluation batches before scoring
        # (ops.quant.calibrate; same recipe as serve.py --quant static).
        from perceiverio_pytorch_tpu.ops.quant import calibrate

        calib = []
        for img, _ in dataset_iterator(dataset, batch_size, num_workers=4):
            calib.append(
                (normalize_imagenet(jnp.asarray(img, jnp.float32)),)
            )
            if len(calib) >= 2:
                break
        variables = calibrate(model, variables, calib)

    k = min(5, num_classes)

    def forward(v, img):
        logits = model.apply(v, normalize_imagenet(img.astype(jnp.float32)))
        return jax.lax.top_k(logits, k)[1]  # [B, k] class indices

    if mesh_devices:
        from perceiverio_pytorch_tpu.parallel import make_data_parallel_apply
        from perceiverio_pytorch_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((mesh_devices, 1))

        class _Fwd:
            apply = staticmethod(forward)

        step, place = make_data_parallel_apply(_Fwd, mesh)

        def run(v, img):
            return step(*place(v, img))

    else:
        run = jax.jit(forward)

    top1 = top5 = seen = 0
    t0 = None
    for img, label in dataset_iterator(dataset, batch_size, num_workers=4):
        pred5 = np.asarray(run(variables, jnp.asarray(img)))
        if t0 is None:  # exclude the compile from throughput
            t0 = time.perf_counter()
            t0_seen = 0
        top1 += int((pred5[:, 0] == label).sum())
        top5 += int((pred5 == label[:, None]).any(axis=1).sum())
        seen += len(label)
        if limit and seen >= limit:
            break
    elapsed = time.perf_counter() - t0 if t0 else 0.0
    result = {
        "images": seen,
        "top1": round(top1 / max(seen, 1), 4),
        "top5": round(top5 / max(seen, 1), 4),
        "images_per_sec": round((seen - batch_size) / elapsed, 1)
        if elapsed > 0 and seen > batch_size else None,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default=None,
                        help="root/<class>/*.png image tree (default: a"
                             " synthetic 3-class demo set)")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax variables directory (training.checkpoint)")
    parser.add_argument("--torch-checkpoint", default=None,
                        help="reference-convention .pth state dict")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--full-scale", action="store_true",
                        help="exact shipped ImageNet conv-prep config, bf16")
    parser.add_argument("--mesh", type=int, default=None, metavar="N",
                        help="data-parallel evaluation over N devices")
    parser.add_argument("--quant", nargs="?", const="dynamic", default=None,
                        choices=["dynamic", "static"])
    parser.add_argument("--limit", type=int, default=None,
                        help="stop after this many images")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(data_dir=args.data_dir, checkpoint=args.checkpoint,
         torch_checkpoint=args.torch_checkpoint, batch_size=args.batch_size,
         full_scale=args.full_scale, mesh_devices=args.mesh, quant=args.quant,
         limit=args.limit)

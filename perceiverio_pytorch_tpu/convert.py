"""Checkpoint conversion CLI: reference ``.pth`` <-> native orbax.

The reference distributes converted Haiku->PyTorch checkpoints loaded with
``torch.load(path)["model_state_dict"]`` (example_language.py:36-41 and the
other three examples).  The adapter functions live in
``utils/torch_checkpoint.py``; this module is the one-liner around them:

    # torch -> native (orbax directory ready for restore_variables/serving)
    python -m perceiverio_pytorch_tpu.convert language_perceiver_io_bytes.pth \
        /ckpt/mlm --family language

    # native -> torch (a .pth the REFERENCE example code can load)
    python -m perceiverio_pytorch_tpu.convert /ckpt/mlm back.pth --family language

Direction is inferred from the arguments: a ``.pth`` source converts to an
orbax directory; a directory source exports to ``.pth``.  The family picks
the shipped full-scale model config (the checkpoint contract): its jitted
``init`` provides the variables template — shapes are verified leaf by
leaf during conversion, so a wrong-family checkpoint fails loudly with the
exact offending path.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def _force_cpu() -> None:
    """Pin the CLI to the host CPU backend.

    Checkpoint conversion is a host-side operation (torch.load -> layout
    transforms -> orbax write); routing the hundreds of MB of full-scale
    params through an accelerator adds nothing and, on remote-transport
    device plugins, turns a seconds-long job into a transfer-bound one.
    Both the env var AND the config update are needed: plugins loaded via
    sitecustomize can override JAX_PLATFORMS at interpreter startup.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialised; device_put below still lands host-side

__all__ = ["build_family_template", "convert", "FAMILIES"]

FAMILIES = ("language", "classification", "flow", "multimodal")


def build_family_template(family: str, prep_type: str = "fourier_pos_convnet"):
    """(model, jitted-init variables, overrides, tied) for a shipped config.

    The template must come from a real jitted ``init`` (not ``eval_shape``):
    derived "consts" collections are copied from it verbatim.
    """
    rng = jax.random.PRNGKey(0)
    if family == "language":
        from perceiverio_pytorch_tpu.models import LanguagePerceiver
        from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
            LANGUAGE_OVERRIDES, LANGUAGE_TIED)

        model = LanguagePerceiver()
        tokens = jnp.zeros((1, model.max_seq_len), jnp.int32)
        mask = jnp.ones((1, model.max_seq_len), bool)
        variables = jax.jit(model.init)(rng, tokens, mask)
        return model, variables, LANGUAGE_OVERRIDES, LANGUAGE_TIED
    if family == "classification":
        from perceiverio_pytorch_tpu.models import (
            ClassificationPerceiver, PrepType)

        model = ClassificationPerceiver(prep_type=PrepType(prep_type))
        img = jnp.zeros((1, 3, 224, 224), jnp.float32)
        variables = jax.jit(model.init)(rng, img)
        return model, variables, None, None
    if family == "flow":
        from perceiverio_pytorch_tpu.models import FlowPerceiver

        model = FlowPerceiver()
        img = jnp.zeros((1, 3, *model.img_size), jnp.float32)
        variables = jax.jit(model.init)(rng, img, img)
        return model, variables, None, None
    if family == "multimodal":
        from perceiverio_pytorch_tpu.models import MultiModalPerceiver

        model = MultiModalPerceiver()
        video = jnp.zeros(
            (1, model.num_frames, 3, *model.img_size), jnp.float32
        )
        audio = jnp.zeros(
            (1, model.num_frames * model.audio_samples_per_frame, 1),
            jnp.float32,
        )
        variables = jax.jit(lambda k, v, a: model.init(k, v, a, 16))(
            rng, video, audio
        )
        return model, variables, None, None
    raise ValueError(f"unknown family {family!r}; pick one of {FAMILIES}")


def convert(
    src: str,
    dst: str,
    template,
    overrides=None,
    tied=None,
    overwrite: bool = False,
) -> list:
    """Convert between a reference ``.pth`` and a native orbax directory.

    Args:
      src/dst: one of them ends in ``.pth`` (torch side); the other is an
        orbax checkpoint directory.
      template: flax variables from a jitted ``model.init`` (structure,
        shapes, and the derived consts).
    Returns:
      the list of unused torch keys (torch->native direction; [] otherwise).
    """
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_variables, save_variables)
    from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
        convert_state_dict, load_torch_checkpoint, save_torch_checkpoint)

    to_native = src.endswith(".pth")
    if to_native == dst.endswith(".pth"):
        raise ValueError(
            "exactly one of src/dst must be a .pth file (the torch side);"
            f" got src={src!r} dst={dst!r}"
        )
    if to_native:
        variables, unused = convert_state_dict(
            load_torch_checkpoint(src), template, overrides
        )
        save_variables(dst, variables, overwrite=overwrite)
        return unused
    variables = restore_variables(src, template=template)
    # overrides are flax->torch for BOTH adapter directions
    save_torch_checkpoint(dst, variables, overrides=overrides, tied=tied)
    return []


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m perceiverio_pytorch_tpu.convert",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("src", help=".pth file or orbax checkpoint directory")
    ap.add_argument("dst", help="orbax checkpoint directory or .pth file")
    ap.add_argument("--family", required=True, choices=FAMILIES)
    ap.add_argument(
        "--prep-type", default="fourier_pos_convnet",
        help="classification variant (conv1x1 / pixels / fourier_pos_convnet)",
    )
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)

    _force_cpu()
    _, template, overrides, tied = build_family_template(
        args.family, args.prep_type
    )
    unused = convert(
        args.src, args.dst, template, overrides, tied,
        overwrite=args.overwrite,
    )
    n_leaves = len(jax.tree_util.tree_leaves(template))
    print(f"converted {args.family}: {n_leaves} leaves -> {args.dst}")
    if unused:
        print(f"unused torch keys ({len(unused)}): {unused}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

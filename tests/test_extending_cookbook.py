"""Executable version of docs/EXTENDING.md — the new-modality cookbook.

Every code block in that guide is mirrored here so the documentation cannot
rot: if a protocol changes, this file fails first.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from perceiverio_pytorch_tpu import PerceiverIO
from perceiverio_pytorch_tpu.core.position_encoding import (
    PosEncodingType,
    build_position_encoding,
)
from perceiverio_pytorch_tpu.core.queries import FourierQuery, TrainableQuery
from perceiverio_pytorch_tpu.io_processors.postprocessors import (
    ClassificationPostprocessor,
    ProjectionPostprocessor,
)
from perceiverio_pytorch_tpu.io_processors.preprocessors import OneHotPreprocessor
from perceiverio_pytorch_tpu.training import Trainer


# --------------------------------------------------------------------------
# The cookbook's custom modality: an IMU-style sensor stream [B, T, 6].
# Preprocessor protocol (io_processors/preprocessors.py):
#   __call__(inputs, *, pos=None, train=False) -> (with_pos, without_pos)
#   n_output_channels() -> int
# --------------------------------------------------------------------------
class SensorPreprocessor(nn.Module):
    num_timesteps: int
    raw_channels: int = 6
    num_channels: int = 32
    num_bands: int = 8

    def setup(self):
        self.project = nn.Dense(self.num_channels)
        self.position_enc = build_position_encoding(
            PosEncodingType.FOURIER,
            index_dims=(self.num_timesteps,),
            fourier_position_encoding_kwargs=dict(
                num_bands=self.num_bands,
                max_resolution=(self.num_timesteps,),
                sine_only=False,
                concat_pos=True,
            ),
        )

    def n_output_channels(self) -> int:
        # projection + fourier features (2*bands + 1 raw pos per dim)
        return self.num_channels + 2 * self.num_bands + 1

    def __call__(self, inputs, *, pos=None, train: bool = False):
        features = self.project(inputs)  # [B, T, num_channels]
        pos_enc = self.position_enc(inputs.shape[0], pos=pos)
        with_pos = jnp.concatenate([features, pos_enc], axis=-1)
        return with_pos, features


def test_single_modality_sensor_regression_end_to_end():
    """Cookbook part 1: one custom modality through PerceiverIO + training."""
    T = 64
    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=2,
        num_latents=16,
        num_latent_channels=64,
        input_preprocessors=SensorPreprocessor(num_timesteps=T),
        # dense per-timestep output: a Fourier query over the same axis
        output_queries=FourierQuery(
            output_index_dims=(T,), num_bands=8, max_resolution=(T,)
        ),
        final_project_out_channels=64,
        output_postprocessors=ProjectionPostprocessor(
            num_inputs=64, num_outputs=3
        ),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, T, 6), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, T, 3)

    # trains with the standard loop
    y = jnp.asarray(rng.randn(2, T, 3), jnp.float32)

    def loss_fn(p, x, y):
        return jnp.mean((model.apply(p, x) - y) ** 2)

    trainer = Trainer(loss_fn, optax.adam(1e-3), num_batch_args=2)
    state = trainer.init_state(params)
    l0 = float(jax.jit(loss_fn)(params, x, y))
    state = trainer.fit(state, iter([(x, y)] * 5), num_steps=5)
    l1 = float(jax.jit(loss_fn)(state.params, x, y))
    assert l1 < l0


def test_multimodal_sensor_plus_label_autoencoding():
    """Cookbook part 2: combine the custom modality with a label modality --
    channel padding, mask tokens, per-modality queries/postprocessors all
    come from the framework (dict wiring, sorted-key concat)."""
    T = 32
    n_classes = 10
    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=2,
        num_latents=16,
        num_latent_channels=64,
        input_preprocessors={
            "sensor": SensorPreprocessor(num_timesteps=T),
            "label": OneHotPreprocessor(input_channels=n_classes),
        },
        # label tokens are fully masked out at input (autoencoding: the
        # model must reconstruct the label from the sensor stream)
        input_mask_probs={"sensor": 0.0, "label": 1.0},
        input_padding_channels=2,
        output_queries={
            "sensor": FourierQuery(
                output_index_dims=(T,), num_bands=8, max_resolution=(T,)
            ),
            "label": TrainableQuery(
                output_index_dims=(1,), num_channels=32
            ),
        },
        output_query_padding_channels=2,
        final_project_out_channels=64,
        output_postprocessors={
            "sensor": ProjectionPostprocessor(num_inputs=64, num_outputs=6),
            "label": ClassificationPostprocessor(
                num_classes=n_classes, num_input_channels=64
            ),
        },
    )
    rng = np.random.RandomState(0)
    batch = {
        "sensor": jnp.asarray(rng.randn(2, T, 6), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray([3, 7]), n_classes),
    }
    # deterministic is a Python-level branch: keep it static under jit
    params = jax.jit(
        lambda key, b: model.init(key, b, deterministic=False)
    )(jax.random.PRNGKey(0), batch)
    out = jax.jit(model.apply)(params, batch)
    assert set(out.keys()) == {"sensor", "label"}
    assert out["sensor"].shape == (2, T, 6)
    assert out["label"].shape == (2, n_classes)

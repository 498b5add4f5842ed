"""Byte-level masked-language-model Perceiver.

Reference: /root/reference/perceiver_io/language_perceiver.py -- vocab 262,
seq 2048, embed 768, 26 self-attends x 1 block, 256 latents x 1280 channels,
qk 256 with 8 heads on both attends, decoder v=768 without final projection,
tied input/output embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from perceiverio_pytorch_tpu.config import DEFAULT, Policy
from perceiverio_pytorch_tpu.core.perceiver import PerceiverIO
from perceiverio_pytorch_tpu.core.queries import TrainableQuery
from perceiverio_pytorch_tpu.io_processors.postprocessors import EmbeddingPostprocessor
from perceiverio_pytorch_tpu.io_processors.preprocessors import EmbeddingPreprocessor


class LanguagePerceiver(nn.Module):
    """Perceiver for masked language modelling (language_perceiver.py:10-74)."""

    vocab_size: int = 262
    max_seq_len: int = 2048
    embed_dim: int = 768
    num_self_attends_per_block: int = 26
    num_blocks: int = 1
    num_latents: int = 256
    num_latent_channels: int = 1280
    policy: Policy = DEFAULT
    remat: bool = False

    def setup(self):
        # Shared token embedding: encoder input and tied output decode
        # (language_perceiver.py:58).
        self.embed = nn.Embed(
            num_embeddings=self.vocab_size, features=self.embed_dim
        )

        input_preprocessor = EmbeddingPreprocessor(
            vocab_size=self.vocab_size,
            max_seq_len=self.max_seq_len,
            embedding_dims=self.embed_dim,
            embed=self.embed,
        )
        output_postprocessor = EmbeddingPostprocessor(
            embedding=self.embed, vocab_size=self.vocab_size
        )
        output_query = TrainableQuery(
            output_index_dims=self.max_seq_len,
            num_channels=self.embed_dim,
        )

        self.perceiver = PerceiverIO(
            final_project=False,
            num_self_attends_per_block=self.num_self_attends_per_block,
            num_blocks=self.num_blocks,
            num_latents=self.num_latents,
            num_latent_channels=self.num_latent_channels,
            input_preprocessors=input_preprocessor,
            output_postprocessors=output_postprocessor,
            output_queries=output_query,
            perceiver_encoder_kwargs=dict(
                num_self_attend_heads=8,
                num_cross_attend_heads=8,
                qk_channels=8 * 32,
                v_channels=self.num_latent_channels,
                use_query_residual=True,
            ),
            perceiver_decoder_kwargs=dict(
                qk_channels=8 * 32,
                v_channels=self.embed_dim,
                num_heads=8,
                use_query_residual=False,
            ),
            policy=self.policy,
            remat=self.remat,
        )

    def __call__(
        self,
        inputs,
        input_masks=None,
        *,
        predict_positions=None,
        deterministic: bool = True,
    ):
        """inputs: [B, max_seq_len] int tokens; input_masks: [B, max_seq_len].

        ``predict_positions``: optional [P] int array of sequence positions;
        the decoder then runs only those P query rows and returns
        [B, P, vocab] instead of [B, max_seq_len, vocab].  Exact: attention
        rows are independent, so the selected rows match a full decode
        bit-for-bit (MLM inference only needs logits at the masked
        positions -- the reference always pays the full 2048-row decode).
        P must be static under jit; the positions themselves may be traced.
        """
        subsampled = None
        query_mask = input_masks
        if predict_positions is not None:
            positions = jnp.asarray(predict_positions)
            subsampled = {"__default": positions}
            if input_masks is not None:
                query_mask = jnp.take(input_masks, positions, axis=1)
        return self.perceiver(
            inputs,
            input_mask=input_masks,
            query_mask=query_mask,
            subsampled_output_points=subsampled,
            deterministic=deterministic,
        )

"""Core Perceiver IO: encoder, decoder, multimodal preprocessing, orchestrator.

TPU-native re-implementation of /root/reference/perceiver_io/perceiver.py:
  * ``PerceiverEncoder`` (:13-107): trainable latent array, one cross-attend,
    then ``num_blocks`` weight-shared applications of a stack of
    ``num_self_attends_per_block`` self-attention blocks.  The weight-shared
    repetition runs as ``nn.scan`` with broadcast params -- one traced block
    body regardless of depth, which keeps HLO size and compile time flat.
  * ``PerceiverDecoder`` (:110-180): single query cross-attend over latents,
    optional final projection with "lecun_normal" or "zeros" init.
  * ``PerceiverIO`` (:183-367): modality-agnostic orchestrator; per-modality
    behaviour is injected as dicts of preprocessors / output queries /
    postprocessors with trainable channel padding and the ``"__default"``
    single-modality convention.  Also exposes ``encode``/``decode`` so
    chunked decoding can reuse latents instead of re-encoding per chunk
    (the reference re-encodes: multimodal_perceiver.py:146-157).
  * ``MultimodalPreprocessor`` (:390-499) and ``restructure`` (:370-387) with
    the checkpoint-critical sorted-modality concat ordering.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.config import DEFAULT, Policy, resolve_remat_policy
from perceiverio_pytorch_tpu.core import position_encoding
from perceiverio_pytorch_tpu.core.attention import (
    CrossAttention,
    FoldedQuery,
    SelfAttention,
)
from perceiverio_pytorch_tpu.utils.initializers import lecun_normal, zeros as zeros_init

ModuleOrDict = Union[None, nn.Module, Mapping[str, nn.Module]]


def _signature_accepts_train(fn: Any) -> bool:
    """Whether ``fn``'s call signature accepts ``train`` (or ``**kwargs``).

    Used only to adjudicate the legacy-preprocessor fallback after a
    TypeError: if the signature accepts ``train``, the error came from
    *inside* the preprocessor and must propagate. Returns True when the
    signature cannot be introspected, so undiagnosable errors surface
    rather than being retried.
    """
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return True
    return any(
        p.name == "train" or p.kind is inspect.Parameter.VAR_KEYWORD
        for p in sig.parameters.values()
    )


def restructure(
    modality_sizes: Mapping[str, int], inputs: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Partition a [B, N, C] array back into per-modality arrays.

    Modalities are laid out in sorted name order (perceiver.py:381-386) --
    this ordering is checkpoint-compatibility-critical.
    """
    outputs = {}
    index = 0
    for modality in sorted(modality_sizes.keys()):
        size = modality_sizes[modality]
        outputs[modality] = inputs[:, index : index + size]
        index += size
    return outputs


class _SelfAttendStack(nn.Module):
    """One block: ``num_self_attends`` distinct self-attention layers.

    Scanned over ``num_blocks`` with broadcast (shared) params by the encoder.
    """

    num_self_attends: int
    in_channels: int
    num_heads: int
    qk_channels: Optional[int]
    v_channels: Optional[int]
    widening_factor: int
    dropout_prob: float
    policy: Policy

    def setup(self):
        self.layers = [
            SelfAttention(
                in_channels=self.in_channels,
                num_heads=self.num_heads,
                dropout_prob=self.dropout_prob,
                qk_channels=self.qk_channels,
                v_channels=self.v_channels,
                widening_factor=self.widening_factor,
                policy=self.policy,
                name=str(i),
            )
            for i in range(self.num_self_attends)
        ]

    def __call__(self, latents, deterministic: bool = True):
        if self._use_pipeline():
            return self._pipelined(latents, deterministic), ()
        if self._use_layer_scan():
            return self._layer_scanned(latents, deterministic), ()
        for layer in self.layers:
            latents = layer(latents, deterministic=deterministic)
        return latents, ()

    def _use_layer_scan(self) -> bool:
        """Scan the distinct layers with stacked params (Policy.layer_scan)?

        Unrolled tracing emits one layer body per distinct layer into the
        HLO -- minutes of XLA compile at flow/MLM depth (24/26 layers).
        Structural passes stay unrolled: init (params don't exist yet) and
        mutable quant_stats calibration (amax variables are created/folded
        in place, which cannot happen under lax.scan).
        """
        pol = self.policy
        if pol.layer_scan not in ("auto", "on", "off"):
            raise ValueError(
                f"Policy.layer_scan must be 'auto', 'on' or 'off'; got"
                f" {pol.layer_scan!r}"
            )
        if pol.layer_scan == "off" or self.num_self_attends < 2:
            return False
        if self.is_initializing() or self.is_mutable_collection("quant_stats"):
            return False
        if pol.layer_scan == "on":
            return True
        return self.num_self_attends >= pol.layer_scan_min

    def _layer_scanned(self, latents, deterministic: bool = True):
        """One lax.scan over the distinct layers, params stacked [L, ...].

        The variable tree keeps the per-layer children ("0".."23": checkpoint
        layout, torch-adapter paths, and parity tests are untouched); only
        the traced program changes -- the layer body compiles ONCE and the
        stacked params stream through it.  Exact vs the unrolled loop (same
        dtypes, same op order per layer).  Dropout folds one base key per
        layer index, so each application site draws an independent mask (the
        masks differ from the unrolled path's flax-derived ones, which is
        fine -- dropout needs independence, not a particular assignment).
        """
        all_vars = self.variables
        names = [str(i) for i in range(self.num_self_attends)]
        per_layer = [
            {coll: tree[n] for coll, tree in all_vars.items() if n in tree}
            for n in names
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
        layer = self.layers[0].clone(parent=None)
        if not deterministic and self.dropout_prob > 0.0:
            base = self.make_rng("dropout")

            def body(h, xs):
                v, i = xs
                out = layer.apply(
                    v, h, deterministic=False,
                    rngs={"dropout": jax.random.fold_in(base, i)},
                )
                return out, ()

            latents, _ = jax.lax.scan(
                body, latents,
                (stacked, jnp.arange(self.num_self_attends)),
            )
        else:

            def body(h, v):
                return layer.apply(v, h, deterministic=True), ()

            latents, _ = jax.lax.scan(body, latents, stacked)
        return latents

    def _use_pipeline(self) -> bool:
        """Route through the GPipe schedule (Policy.pp_mesh)?

        Structural passes stay sequential: init (params don't exist yet)
        and mutable quant_stats passes (int8_static calibration folds amax
        in-place, which cannot stream through shard_map stages).
        """
        pol = self.policy
        if pol.pp_mesh is None:
            return False
        if self.is_initializing() or self.is_mutable_collection("quant_stats"):
            return False
        if pol.pp_axis not in pol.pp_mesh.shape:
            raise ValueError(
                f"Policy.pp_axis {pol.pp_axis!r} is not an axis of pp_mesh"
                f" {tuple(pol.pp_mesh.shape)}"
            )
        if pol.pp_circ_repeats < 1:
            raise ValueError(
                f"Policy.pp_circ_repeats must be >= 1; got"
                f" {pol.pp_circ_repeats}"
            )
        n_stages = pol.pp_mesh.shape[pol.pp_axis]
        if n_stages <= 1:
            return False  # sequential path
        if self.num_self_attends % (n_stages * pol.pp_circ_repeats):
            raise ValueError(
                f"{self.num_self_attends} self-attend layers do not divide"
                f" into {n_stages} pipeline stages"
                + (
                    f" x {pol.pp_circ_repeats} circular repeats"
                    if pol.pp_circ_repeats > 1 else ""
                )
            )
        return True

    def _pipelined(self, latents, deterministic: bool = True):
        """GPipe over the distinct layers: every variable collection of the
        per-layer children (params; quant_stats for calibrated int8) is
        stacked on a [n_stages, layers_per_stage] axis and sharded over
        Policy.pp_axis; microbatches stream via ppermute
        (parallel/pipeline.pipeline_spmd).

        Dropout training works through the pipeline: one base "dropout" key
        is folded per (block, tick, stage, layer) inside the schedule, so
        every application site draws an independent mask (the masks differ
        from the sequential path's flax-derived ones, which is fine --
        dropout only needs independence, not a particular assignment)."""
        from ..parallel.pipeline import (
            _stage_scan_fn, pipeline_spmd, stack_layer_params)

        pol = self.policy
        n_stages = pol.pp_mesh.shape[pol.pp_axis]
        all_vars = self.variables
        per_layer = {
            str(i): {
                coll: tree[str(i)]
                for coll, tree in all_vars.items()
                if str(i) in tree
            }
            for i in range(self.num_self_attends)
        }
        stacked = stack_layer_params(
            per_layer, n_stages, circ_repeats=pol.pp_circ_repeats
        )
        layer = self.layers[0].clone(parent=None)
        needs_rng = not deterministic and self.dropout_prob > 0.0
        if needs_rng:
            rng = self.make_rng("dropout")
            stage_fn = _stage_scan_fn(
                lambda v, h, k: layer.apply(
                    v, h, deterministic=False, rngs={"dropout": k}
                ),
                with_rng=True,
            )
        else:
            rng = None
            stage_fn = _stage_scan_fn(
                lambda v, h: layer.apply(v, h, deterministic=True)
            )

        return pipeline_spmd(
            stage_fn,
            stacked,
            latents,
            pol.pp_mesh,
            num_microbatches=pol.pp_microbatches,
            axis_name=pol.pp_axis,
            rng=rng,
            circ_repeats=pol.pp_circ_repeats,
        )


class PerceiverEncoder(nn.Module):
    """Scalable fully attentional encoder (perceiver.py:13-107)."""

    num_input_channels: int
    num_self_attends_per_block: int = 6
    num_blocks: int = 8
    num_latents: int = 512
    num_latent_channels: int = 1024
    qk_channels: Optional[int] = None
    v_channels: Optional[int] = None
    num_cross_attend_heads: int = 1
    num_self_attend_heads: int = 8
    cross_attend_widening_factor: int = 1
    self_attend_widening_factor: int = 1
    dropout_prob: float = 0.0
    latent_pos_enc_init_scale: float = 0.02
    cross_attention_shape_for_attn: str = "kv"
    use_query_residual: bool = True
    policy: Policy = DEFAULT
    # Rematerialise the self-attend block stack in the backward pass
    # (jax.checkpoint): trades ~1 extra forward of FLOPs for O(depth) ->
    # O(1) activation memory across the weight-shared blocks.
    remat: bool = False

    def setup(self):
        if self.num_latent_channels % self.num_self_attend_heads != 0:
            raise ValueError(
                f"num_z_channels ({self.num_latent_channels}) must be divisible"
                f" by num_self_attend_heads ({self.num_self_attend_heads})."
            )
        if self.num_latent_channels % self.num_cross_attend_heads != 0:
            raise ValueError(
                f"num_z_channels ({self.num_latent_channels}) must be divisible"
                f" by num_cross_attend_heads ({self.num_cross_attend_heads})."
            )

        self.latent_pos_enc = position_encoding.TrainablePositionEncoding(
            index_dim=self.num_latents,
            num_channels=self.num_latent_channels,
            init_scale=self.latent_pos_enc_init_scale,
        )

        self.cross_attend = CrossAttention(
            q_in_channels=self.num_latent_channels,
            kv_in_channels=self.num_input_channels,
            dropout_prob=self.dropout_prob,
            num_heads=self.num_cross_attend_heads,
            widening_factor=self.cross_attend_widening_factor,
            shape_for_attn=self.cross_attention_shape_for_attn,
            qk_channels=self.qk_channels,
            v_channels=self.v_channels,
            use_query_residual=self.use_query_residual,
            policy=self.policy,
        )

        stack_kwargs = dict(
            num_self_attends=self.num_self_attends_per_block,
            in_channels=self.num_latent_channels,
            num_heads=self.num_self_attend_heads,
            qk_channels=self.qk_channels,
            v_channels=self.v_channels,
            widening_factor=self.self_attend_widening_factor,
            dropout_prob=self.dropout_prob,
            policy=self.policy,
        )
        stack_cls = _SelfAttendStack
        if self.remat:
            # deterministic (arg index 2 incl. the module) must stay static
            stack_cls = nn.remat(
                stack_cls,
                static_argnums=(2,),
                policy=resolve_remat_policy(self.policy),
            )
        self._fn_lift_blocks = (
            self.num_blocks > 1 and self.policy.quant == "int8_static"
        )
        if self.num_blocks > 1 and not self._fn_lift_blocks:
            # Weight sharing across blocks (perceiver.py:104-106) as a scan
            # with broadcast params: the block body is traced/compiled once.
            scan_cls = nn.scan(
                stack_cls,
                variable_broadcast=["params", "consts"],
                split_rngs={"params": False, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_blocks,
            )
            self.self_attends = scan_cls(**stack_kwargs, name="self_attends")
        else:
            # Plain shared instance.  For static-quant models the block
            # repetition is lifted over this instance at CALL time: flax
            # cannot CREATE carried collections inside nn.scan, so
            # init/calibration passes (mutable "quant_stats" -- the amax
            # variables are created/max-folded there) run an unrolled loop
            # over the same instance instead, and ordinary applies scan
            # with the stats as read-only broadcast.  Param paths match
            # the class-scan exactly.
            self.self_attends = stack_cls(**stack_kwargs, name="self_attends")

    def latents(self, inputs) -> jnp.ndarray:
        """Initial latent array for the first cross-attend: [B, N_lat, C_lat]."""
        return self.latent_pos_enc(batch_size=inputs.shape[0])

    def __call__(self, inputs, latents, *, input_mask=None, deterministic=True,
                 kv_logical_len=None):
        # The reference builds an outer-product mask with an all-ones query
        # mask (perceiver.py:100-102); factored kv-mask form is equivalent.
        with jax.named_scope("encoder_cross_attend"):
            latents = self.cross_attend(
                latents,
                inputs,
                kv_mask=input_mask,
                deterministic=deterministic,
                kv_logical_len=kv_logical_len,
            )
        with jax.named_scope("encoder_self_attends"):
            if not self._fn_lift_blocks:
                latents, _ = self.self_attends(latents, deterministic)
            elif self.is_initializing() or self.is_mutable_collection(
                "quant_stats"
            ):
                for _ in range(self.num_blocks):
                    latents, _ = self.self_attends(latents, deterministic)
            else:

                def run_block(stack, carry, _):
                    out, _ = stack(carry, deterministic)
                    return out, ()

                scan = nn.scan(
                    run_block,
                    variable_broadcast=["params", "consts", "quant_stats"],
                    split_rngs={"params": False, "dropout": True},
                    in_axes=0,
                    out_axes=0,
                )
                latents, _ = scan(
                    self.self_attends, latents, jnp.arange(self.num_blocks)
                )
        return latents


class PerceiverDecoder(nn.Module):
    """Cross-attention decoder (perceiver.py:110-180)."""

    query_channels: int
    final_project_out_channels: int
    num_latent_channels: int = 1024
    qk_channels: Optional[int] = None
    v_channels: Optional[int] = None
    use_query_residual: bool = False
    output_w_init: str = "lecun_normal"
    num_heads: int = 1
    final_project: bool = True
    policy: Policy = DEFAULT

    def setup(self):
        self.decoding_cross_attn = CrossAttention(
            q_in_channels=self.query_channels,
            kv_in_channels=self.num_latent_channels,
            dropout_prob=0.0,
            num_heads=self.num_heads,
            widening_factor=1,
            shape_for_attn="kv",
            qk_channels=self.qk_channels,
            v_channels=self.v_channels,
            use_query_residual=self.use_query_residual,
            policy=self.policy,
        )
        if self.final_project:
            if self.output_w_init == "lecun_normal":
                kernel_init = lecun_normal()
            elif self.output_w_init == "zeros":
                kernel_init = zeros_init
            else:
                raise ValueError(
                    f"{self.output_w_init} not supported as output_w_init"
                )
            self.final_layer = nn.Dense(
                self.final_project_out_channels,
                kernel_init=kernel_init,
                bias_init=nn.initializers.zeros,
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
            )

    def __call__(self, query, latents, *, query_mask=None, deterministic=True):
        with jax.named_scope("decoder_cross_attend"):
            output = self.decoding_cross_attn(
                query,
                latents,
                q_mask=query_mask,
                deterministic=deterministic,
            )
        if self.final_project:
            output = self.final_layer(output)
        return output


class MultimodalPreprocessor(nn.Module):
    """Per-modality preprocess, pad to common channels, optional token masking
    (perceiver.py:390-499)."""

    input_preprocessors: Optional[Mapping[str, nn.Module]] = None
    mask_probs: Optional[Mapping[str, float]] = None
    min_padding_size: int = 2
    input_channels: Optional[Mapping[str, int]] = None

    def _channels_per_modality(self) -> Dict[str, int]:
        if self.input_preprocessors is not None:
            assert self.input_channels is None, (
                "input_channels and modalities are mutually exclusive"
            )
            return {
                m: p.n_output_channels()
                for m, p in self.input_preprocessors.items()
            }
        assert self.input_channels is not None, (
            "if no preprocessors, input_channels must be specified"
        )
        return dict(self.input_channels)

    def n_output_channels(self) -> int:
        channels = self._channels_per_modality()
        return max(channels.values()) + self.min_padding_size

    def setup(self):
        channels = self._channels_per_modality()
        common = max(channels.values()) + self.min_padding_size
        self._common_channels = common

        if self.mask_probs is not None:
            self.mask_tokens = {
                m: position_encoding.TrainablePositionEncoding(
                    index_dim=1, num_channels=common, init_scale=0.02
                )
                for m in channels
            }

        if max(channels.values()) != min(channels.values()) or self.min_padding_size != 0:
            self.padding_embeddings = {
                m: position_encoding.TrainablePositionEncoding(
                    index_dim=1, num_channels=common - c, init_scale=0.02
                )
                for m, c in channels.items()
            }
        else:
            self.padding_embeddings = None

    def __call__(self, inputs, *, pos=None, train: bool = False):
        if self.input_preprocessors is None:
            outputs = dict(inputs)
            inputs_without_pos = dict(inputs)
        else:
            outputs = {}
            inputs_without_pos = {}
            for modality, preprocessor in self.input_preprocessors.items():
                # Uniform preprocessor protocol: every preprocessor accepts
                # ``train`` (ImagePreprocessor's BatchNorm uses batch
                # statistics and updates its EMA state when train=True).
                # User-supplied preprocessors without a ``train`` kwarg are
                # tolerated (docs/MIGRATION.md "Custom preprocessors") — but
                # only when the signature positively lacks it, so a TypeError
                # raised *inside* a train-aware preprocessor is never
                # swallowed and silently re-run without train.
                try:
                    out = preprocessor(inputs[modality], pos=pos, train=train)
                except TypeError:
                    if _signature_accepts_train(preprocessor):
                        raise
                    out = preprocessor(inputs[modality], pos=pos)
                outputs[modality], inputs_without_pos[modality] = out

        if self.padding_embeddings is not None:
            modality_sizes = {}
            padded = {}
            for modality, output in outputs.items():
                pos_enc = self.padding_embeddings[modality](output.shape[0])
                padding = jnp.broadcast_to(
                    pos_enc,
                    (
                        output.shape[0],
                        output.shape[1],
                        self._common_channels - output.shape[2],
                    ),
                ).astype(output.dtype)
                padded[modality] = jnp.concatenate([output, padding], axis=2)
                modality_sizes[modality] = padded[modality].shape[1]
            outputs = padded
        else:
            modality_sizes = {m: o.shape[1] for m, o in outputs.items()}

        if self.mask_probs is not None:
            masked = {}
            for modality, output in outputs.items():
                mask_token = self.mask_tokens[modality](output.shape[0])
                mask_prob = self.mask_probs[modality]
                if mask_prob <= 0.0:
                    masked[modality] = output
                    continue
                if mask_prob >= 1.0:
                    mask = jnp.ones((output.shape[0], output.shape[1], 1), output.dtype)
                else:
                    rng = self.make_rng("mask")
                    mask = jax.random.bernoulli(
                        rng, mask_prob, (output.shape[0], output.shape[1], 1)
                    ).astype(output.dtype)
                masked[modality] = (1.0 - mask) * output + mask * mask_token
            outputs = masked

        # Predictable (sorted) modality ordering -- checkpoint-critical.
        concat = jnp.concatenate(
            [outputs[k] for k in sorted(outputs.keys())], axis=1
        )
        return concat, modality_sizes, inputs_without_pos


class PerceiverIO(nn.Module):
    """The Perceiver IO orchestrator (perceiver.py:183-367).

    Per-modality behaviour is injected as dicts of modules:
    ``input_preprocessors`` / ``output_queries`` / ``output_postprocessors``.
    A bare module (or array input) is wrapped under the ``"__default"`` key.
    """

    num_blocks: int = 8
    num_self_attends_per_block: int = 6
    num_latents: int = 512
    num_latent_channels: int = 1024
    final_project: bool = True
    final_project_out_channels: Optional[int] = None
    perceiver_encoder_kwargs: Optional[Mapping[str, Any]] = None
    perceiver_decoder_kwargs: Optional[Mapping[str, Any]] = None
    input_preprocessors: ModuleOrDict = None
    output_postprocessors: ModuleOrDict = None
    output_queries: ModuleOrDict = None
    output_query_padding_channels: int = 0
    input_padding_channels: int = 0
    input_channels: Union[None, int, Mapping[str, int]] = None
    input_mask_probs: Optional[Mapping[str, float]] = None
    policy: Policy = DEFAULT
    remat: bool = False  # rematerialise encoder blocks in the backward pass
    # Optional sharding (e.g. NamedSharding(mesh, P("data", "model"))) applied
    # to the preprocessed [B, N_tokens, C] array: sharding the token axis is
    # sequence parallelism for the encoder cross-attend -- the Perceiver's
    # inputs are its only long axis, and GSPMD turns the KV-sharded softmax
    # into an all-reduce of the numerator/denominator over ICI.
    input_token_sharding: Optional[Any] = None

    @staticmethod
    def _as_dict(value: ModuleOrDict) -> Optional[Dict[str, nn.Module]]:
        if value is None:
            return None
        if isinstance(value, nn.Module):
            return {"__default": value}
        return dict(value)

    def setup(self):
        input_channels = self.input_channels
        if isinstance(input_channels, int):
            input_channels = {"__default": input_channels}

        preprocessors = self._as_dict(self.input_preprocessors)
        self.multi_preprocessor = MultimodalPreprocessor(
            input_preprocessors=preprocessors,
            mask_probs=self.input_mask_probs,
            min_padding_size=self.input_padding_channels,
            input_channels=input_channels,
        )

        self.postprocessors = self._as_dict(self.output_postprocessors)
        self.queries = self._as_dict(self.output_queries)
        assert self.queries is not None, "output_queries are required"

        query_channels = (
            max(q.n_query_channels() for q in self.queries.values())
            + self.output_query_padding_channels
        )
        self._query_channels = query_channels

        self.padding_embeddings = {
            m: position_encoding.TrainablePositionEncoding(
                index_dim=1,
                num_channels=query_channels - q.n_query_channels(),
                init_scale=0.02,
            )
            for m, q in self.queries.items()
        }

        final_project_out_channels = (
            self.final_project_out_channels or self.num_latent_channels
        )

        self.encoder = PerceiverEncoder(
            num_input_channels=self.multi_preprocessor.n_output_channels(),
            num_blocks=self.num_blocks,
            num_self_attends_per_block=self.num_self_attends_per_block,
            num_latents=self.num_latents,
            num_latent_channels=self.num_latent_channels,
            policy=self.policy,
            remat=self.remat,
            **(self.perceiver_encoder_kwargs or {}),
        )
        self.decoder = PerceiverDecoder(
            query_channels=query_channels,
            final_project=self.final_project,
            final_project_out_channels=final_project_out_channels,
            num_latent_channels=self.num_latent_channels,
            policy=self.policy,
            **(self.perceiver_decoder_kwargs or {}),
        )

    @property
    def query_channels(self) -> int:
        return self._query_channels

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        inputs,
        *,
        subsampled_output_points=None,
        pos=None,
        input_mask=None,
        query_mask=None,
        deterministic: bool = True,
    ):
        inputs, modality_sizes, inputs_without_pos, flat_inputs = self._preprocess(
            inputs, pos=pos, train=not deterministic
        )

        decoder_query, query_sizes = self.decoder_query(
            flat_inputs,
            modality_sizes,
            inputs_without_pos,
            subsampled_points=subsampled_output_points,
        )

        latents = self._encode_flat(
            flat_inputs, input_mask=input_mask, deterministic=deterministic
        )

        outputs = self.decoder(
            decoder_query,
            latents,
            query_mask=query_mask,
            deterministic=deterministic,
        )
        return self._postprocess(outputs, query_sizes)

    # ------------------------------------------------------------------
    # Encode / decode split (chunked decoding reuses latents)
    # ------------------------------------------------------------------

    def _preprocess(self, inputs, *, pos=None, train: bool = False):
        if not isinstance(inputs, (dict, Mapping)):
            inputs = {"__default": inputs}
        flat_inputs, modality_sizes, inputs_without_pos = self.multi_preprocessor(
            inputs, pos=pos, train=train
        )
        if self.input_token_sharding is not None:
            flat_inputs = jax.lax.with_sharding_constraint(
                flat_inputs, self.input_token_sharding
            )
        return inputs, modality_sizes, inputs_without_pos, flat_inputs

    def _encode_flat(self, flat_inputs, *, input_mask=None, deterministic=True):
        encoder_query = self.encoder.latents(flat_inputs)
        return self.encoder(
            flat_inputs,
            encoder_query,
            input_mask=input_mask,
            deterministic=deterministic,
        )

    def encode(self, inputs, *, pos=None, input_mask=None, deterministic=True):
        """Preprocess + encode once; returns (latents, preprocess state)."""
        _, modality_sizes, inputs_without_pos, flat_inputs = self._preprocess(
            inputs, pos=pos, train=not deterministic
        )
        latents = self._encode_flat(
            flat_inputs, input_mask=input_mask, deterministic=deterministic
        )
        return latents, (flat_inputs, modality_sizes, inputs_without_pos)

    def decode(
        self,
        latents,
        preprocess_state,
        *,
        subsampled_output_points=None,
        query_mask=None,
        deterministic: bool = True,
    ):
        """Decode (a subsample of) the output queries against given latents."""
        flat_inputs, modality_sizes, inputs_without_pos = preprocess_state
        decoder_query, query_sizes = self.decoder_query(
            flat_inputs,
            modality_sizes,
            inputs_without_pos,
            subsampled_points=subsampled_output_points,
        )
        outputs = self.decoder(
            decoder_query,
            latents,
            query_mask=query_mask,
            deterministic=deterministic,
        )
        return self._postprocess(outputs, query_sizes)

    def _postprocess(self, outputs, query_sizes):
        if self.postprocessors:
            if not isinstance(outputs, (dict, Mapping)):
                outputs = restructure(modality_sizes=query_sizes, inputs=outputs)
            outputs = {
                modality: postprocessor(
                    outputs[modality], pos=None, modality_sizes=None
                )
                for modality, postprocessor in self.postprocessors.items()
            }
        if isinstance(outputs, (dict, Mapping)) and list(outputs.keys()) == [
            "__default"
        ]:
            outputs = outputs["__default"]
        return outputs

    def decoder_query(
        self,
        flat_inputs,
        modality_sizes,
        inputs_without_pos=None,
        subsampled_points=None,
    ):
        """Build the concatenated decoder query (perceiver.py:327-367).

        With ``policy.fold_query_pad`` the query is returned in factored
        ``FoldedQuery`` form instead: per modality ``(pos features,
        constant pad vector)``.  The padded [B, Tq, C] concat is then never
        materialised -- Attention folds the pad channels through
        LayerNorm + the Q projection analytically (core/attention.py
        ``_project_q_folded``).  Init still runs the concatenated path so
        the parameter structure (padding embeddings, query LayerNorm,
        projections) is identical either way.
        """
        inputs = restructure(modality_sizes, flat_inputs)
        subsampled_points = subsampled_points or {}
        decoder_queries = {}
        fold = (
            self.policy.fold_query_pad
            and not self.is_initializing()
            and not self.decoder.use_query_residual
            and any(
                self._query_channels > q.n_query_channels()
                for q in self.queries.values()
            )
        )

        dummy_input = None
        if self.queries.keys() != inputs.keys():
            first_input = next(iter(inputs.values()))
            dummy_input = jnp.zeros((first_input.shape[0], 0), first_input.dtype)

        for modality, output_query in self.queries.items():
            input_without_pos = None
            if inputs_without_pos is not None:
                input_without_pos = inputs_without_pos.get(modality, None)
            inputs_for_query = inputs.get(modality)
            if inputs_for_query is None:
                inputs_for_query = dummy_input
            query = output_query(
                inputs_for_query,
                inputs_without_pos=input_without_pos,
                subsampled_points=subsampled_points.get(modality, None),
            )
            # Cast to the compute dtype at the source: the decoder's dense
            # layers cast their inputs anyway, and building the padded
            # concat in fp32 doubles its HBM traffic -- at multimodal scale
            # the query concat alone was 36% of clip decode time.
            if self.policy.compute_dtype is not None:
                query = query.astype(self.policy.compute_dtype)
            query = query.reshape(
                query.shape[0], int(np.prod(query.shape[1:-1])), query.shape[-1]
            )

            if fold:
                # Keep the pad as its raw [C - C_m] parameter vector; the
                # broadcast + concat is folded out downstream.
                pad_vec = self.padding_embeddings[modality](1)[0, 0]
                decoder_queries[modality] = (query, pad_vec)
                continue

            pad = self.padding_embeddings[modality](query.shape[0])
            pad = jnp.broadcast_to(
                pad,
                (
                    query.shape[0],
                    query.shape[1],
                    self._query_channels - query.shape[2],
                ),
            ).astype(query.dtype)
            decoder_queries[modality] = jnp.concatenate([query, pad], axis=2)

        if fold:
            query_sizes = {
                m: q.shape[1] for m, (q, _) in decoder_queries.items()
            }
            parts = tuple(
                decoder_queries[m] for m in sorted(decoder_queries.keys())
            )
            return FoldedQuery(parts=parts), query_sizes

        query_sizes = {m: q.shape[1] for m, q in decoder_queries.items()}
        # Predictable (sorted) ordering across modalities.
        query = jnp.concatenate(
            [decoder_queries[m] for m in sorted(decoder_queries.keys())], axis=1
        )
        return query, query_sizes

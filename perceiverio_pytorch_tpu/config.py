"""Framework-wide configuration: dtype policy and attention implementation choice.

The reference (JOBR0/PerceiverIO_Pytorch) runs fp32 eager PyTorch with an
optional ``torch.cuda.amp.autocast`` in the flow model
(/root/reference/perceiver_io/flow_perceiver.py:14,129).  On TPU the native
fast path is bfloat16 on the MXU with fp32 softmax/layer-norm accumulation,
so we make the policy explicit and thread it through every module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from jax.sharding import Mesh

# Attention implementation selector values.
ATTN_XLA = "xla"  # reference-faithful jnp einsum/softmax path
ATTN_FLASH = "flash"  # Pallas streaming-KV / blocked-Q kernel
ATTN_AUTO = "auto"  # pick flash when the KV axis is long enough


@dataclasses.dataclass(frozen=True)
class Policy:
    """Numerical policy for a model.

    Attributes:
      compute_dtype: dtype activations/matmuls run in (None = keep fp32).
      param_dtype: dtype parameters are stored in.
      softmax_dtype: accumulation dtype for attention softmax.
      attn_impl: one of "xla" | "flash" | "auto".
      flash_min_kv: minimum KV length before "auto" picks the Pallas kernel.
      flash_min_self: minimum self-attention length (Tq == Tk) before
        "auto" picks the kernel -- at flow's 2048x16-head latent stack the
        [B,H,T,T] softmax traffic dominates and flash wins (28.2 vs 32.4
        ms/tile measured in-model); at classification's T=512 XLA wins.
      gelu_approximate: use the tanh-approximate GELU instead of the exact
        erf form.  The reference uses exact GELU (torch F.gelu default), but
        the erf chain fused into the following matmul halves that GEMM's
        MXU throughput on TPU (measured 81 -> 110 TFLOP/s for the MLP pair);
        the tanh form's ~3e-3 max abs deviation is below bf16 rounding noise.
      sp_mesh / sp_axis / sp_min_kv: when a mesh is given, cross-attends
        whose KV axis is at least sp_min_kv tokens run sequence-parallel --
        KV sharded over sp_axis with an all-reduce of the softmax
        statistics (parallel/sequence_parallel); non-divisible token
        counts are padded internally with masked keys.  This is how
        inputs longer than one chip's HBM are encoded.
      sp_impl: "xla" (local logits + stat all-reduce), "flash" (per-device
        Pallas flash over the local KV shard + global lse merge -- ring
        attention; O(block) memory instead of [Tq, Tk/n] local logits), or
        "auto" (flash when the local shard is long enough).
      fold_query_pad: fold the decoder query's constant channel padding
        through LayerNorm + the Q projection analytically instead of
        materialising the padded concat.  Multimodal decode queries are
        ``concat([per-modality pos features, broadcast trainable pad])``
        along channels (reference multimodal_perceiver.py:137-167 pads every
        modality query to a common 1026 channels); the pad channels are
        constant across positions, so their contribution to the layer-norm
        statistics and to ``LN(q) @ W_q`` reduces to per-modality constant
        vectors.  The folded path computes the projected Q directly from the
        narrow pos features (image: 195 of 1026 channels for 97% of the
        805k tokens), skipping the [B, 25k, 1026] concat + pad broadcast
        per decode chunk.  Algebraically exact; only applies when the
        decoder has no query residual (the padded query is then never
        needed post-projection).  Training-compatible (gradients flow
        through the folded form).
      interpret: run Pallas kernels in interpreter mode (CPU tests only).
    """

    compute_dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    attn_impl: str = ATTN_AUTO
    flash_min_kv: int = 8192
    flash_min_self: int = 2048
    # A long-Q cross-attend (q_len >= flash_min_kv) only takes the flash
    # kernel when the KV axis is at least this long: with a short KV the
    # per-block logits are small and XLA's fused GEMM+softmax wins
    # (multimodal decode, 25k queries x 784 latents: 18.7 vs 17.6 clips/s);
    # flow's 182k queries x 2048 latents (1.5 GB of logits) stays flash.
    flash_long_q_min_kv: int = 1024
    gelu_approximate: bool = False
    sp_mesh: Optional[Mesh] = None
    sp_axis: str = "model"
    sp_min_kv: int = 32768
    sp_impl: str = "auto"
    fold_query_pad: bool = False
    # Flash-kernel block sizes (None = kernel defaults, 512x1024, further
    # shrunk to fit VMEM).  Exposed for tuning and for interpreter-mode
    # parity tests at full model scale, where large blocks keep the grid
    # small (the interpreter's unit of overhead is the grid cell).
    flash_block_q: Optional[int] = None
    flash_block_k: Optional[int] = None
    # Target platform for the "auto" attention dispatch ("tpu"/"cpu"/...).
    # None resolves device-correctly at trace time: the jax_default_device
    # config (set by ``jax.default_device(...)``) first, then the process
    # default backend.  Set explicitly only to force a choice.
    backend: Optional[str] = None
    # Pipeline parallelism over the DISTINCT-layer latent stack (flow ships
    # 24 such layers in one block -- flow_perceiver.py:34-42).  When a mesh
    # is given, every _SelfAttendStack whose layer count divides the
    # ``pp_axis`` size runs as a GPipe pipeline (parallel/pipeline.py):
    # per-stage params stacked and sharded over pp_axis, microbatches
    # streaming stage-to-stage via lax.ppermute inside one SPMD program.
    # Composes with data parallelism when the mesh also has a "data" axis.
    # Weight-shared block repeats (num_blocks > 1) re-enter the pipeline
    # with shared weights.  Numerically exact vs the sequential stack;
    # differentiable (drops into a jitted train step as-is).  Dropout
    # training works: per-site keys are folded from the "dropout" rng
    # inside the schedule.  pp_circ_repeats > 1 switches to the CIRCULAR
    # (interleaved) schedule -- each device holds that many round-robin
    # layer groups and microbatches cycle the ring that many times,
    # shrinking the pipeline bubble v-fold ((S-1)/(v*M+S-1)); requires
    # pp_microbatches >= the pipe axis size and layer count divisible by
    # stages * repeats.
    pp_mesh: Optional[Mesh] = None
    pp_axis: str = "pipe"
    pp_microbatches: int = 2
    pp_circ_repeats: int = 1
    # Compile-time lever for DISTINCT-layer stacks (flow ships 24 distinct
    # self-attends in one block, MLM 26 -- flow_perceiver.py:34-42,
    # language_perceiver.py:24-31).  The default unrolled tracing emits L
    # copies of the layer body into the HLO, which costs minutes of XLA
    # compile at flow scale (274 s forward through a remote compile
    # service).  With layer scan, the per-layer param subtrees are stacked
    # on a leading [L, ...] axis at apply time (checkpoint layout unchanged
    # -- the tree still holds per-layer children "0".."23") and ONE
    # lax.scan runs the layer body, so the body is traced and compiled
    # once: the whole flow bench (init + forward compile + run) fits in
    # 120 s cold.  Numerically exact; differentiable; dropout draws an
    # independent folded key per layer.  COST: ~4% steady-state throughput
    # at full scale (flow 36.6-36.9 vs 38.3-38.4 pairs/s, MLM 1028-1034 vs
    # 1067-1075 seq/s, one-process A/Bs; lax.scan unroll=2/4/8 measured
    # WORSE, the cost is the stacked-param materialisation + lost
    # cross-layer fusion, not loop overhead).  Default OFF because the
    # persistent compilation cache (utils/compilation_cache) amortises the
    # unrolled compile to once per machine; switch to "auto"/"on" for
    # compile-bound cold starts (CI, first-boot serving rollouts,
    # interactive experimentation).  "auto" engages when the stack has at
    # least layer_scan_min distinct layers; init and mutable-quant_stats
    # calibration passes always run unrolled (variable creation cannot
    # happen under scan).
    layer_scan: str = "off"
    layer_scan_min: int = 16
    # Selective rematerialisation: when a model is built with remat=True,
    # this names a jax.checkpoint_policies entry controlling WHAT the
    # wrapped block stacks save for the backward pass.  None = full remat
    # (save nothing, recompute the whole stack forward -- minimum memory).
    # "dots_with_no_batch_dims_saveable" saves projection/MLP GEMM outputs
    # but still recomputes batched attention logits/softmax -- it skips the
    # forward-GEMM recompute at the cost of O(saved dots) HBM.
    remat_policy: Optional[str] = None
    # Dynamic int8 quantization of the dense projections (q/k/v/out and
    # the MLP): "int8_dynamic" routes those GEMMs through the int8 MXU
    # with per-token activation scales and per-channel weight scales
    # (ops/quant.py; ~1% relative error per GEMM, int8 measures +16-44%
    # over bf16 at the classification shapes on the Jan-2026 libtpu).
    # Built for inference; differentiating through it uses the exact
    # matmul's gradients (straight-through estimator), i.e. QAT semantics.
    # "int8_static" replaces the per-token activation scales with ONE
    # calibrated scalar per GEMM site (a "quant_stats" collection filled
    # by ops.quant.calibrate) -- no per-row max pass over huge
    # activations, standard PTQ clipping risk instead.
    quant: Optional[str] = None
    # Which attention sites quantize. "all": every projection/MLP GEMM.
    # "latent": the self-attention stack only -- cross-attention sites
    # (the encoder input attend, the decoder) keep the exact GEMM. At
    # flow/multimodal scale the cross sites' per-token quantize traffic
    # on 182k-805k-token activations outweighs their small-K GEMM
    # savings (PERFORMANCE.md item 16); "latent" keeps the int8 win on
    # the latent compute without paying that traffic.
    quant_scope: str = "all"
    interpret: bool = False


def quant_enabled(policy: "Policy", site: str = "latent") -> bool:
    """Validate Policy.quant/quant_scope; is int8 on at this ``site``?

    Args:
      policy: the Policy to read.
      site: "latent" (self-attention stack) or "cross" (cross-attention
        blocks: encoder input attend, decoder).
    """
    if policy.quant_scope not in ("all", "latent"):
        raise ValueError(
            "Policy.quant_scope must be 'all' or 'latent'; got"
            f" {policy.quant_scope!r}"
        )
    if policy.quant is None:
        return False
    if policy.quant in ("int8_dynamic", "int8_static"):
        return policy.quant_scope == "all" or site == "latent"
    raise ValueError(
        "Policy.quant must be None, 'int8_dynamic' or 'int8_static'; got"
        f" {policy.quant!r}"
    )


def quant_mode(policy: "Policy", site: str = "latent") -> Optional[str]:
    """The validated Policy.quant mode at this site, or None when off."""
    return policy.quant if quant_enabled(policy, site) else None


def resolve_remat_policy(policy: "Policy"):
    """Map Policy.remat_policy to a jax.checkpoint policy callable (or None)."""
    if policy.remat_policy is None:
        return None
    import jax

    return getattr(jax.checkpoint_policies, policy.remat_policy)


# fp32 everywhere; used by parity tests against the PyTorch reference.
PARITY = Policy(compute_dtype=jnp.float32, attn_impl=ATTN_XLA)

# bfloat16 compute with fp32 softmax: the TPU production policy.
PERFORMANCE = Policy(
    compute_dtype=jnp.bfloat16,
    attn_impl=ATTN_AUTO,
    gelu_approximate=True,
    fold_query_pad=True,
)

# PERFORMANCE plus dynamic int8 projections: approximate (~1%/GEMM) but
# +19% classification / +8.6% MLM on the int8 MXU.  Right for the
# latent-compute-heavy models; flow/multimodal measured SLOWER with it
# (PERFORMANCE.md item 16).
PERFORMANCE_INT8 = dataclasses.replace(PERFORMANCE, quant="int8_dynamic")

# The static (calibrated) variant -- fastest int8 mode (classification
# 546 img/s, MLM 1381 seq/s) but requires a calibration pass: fill the
# "quant_stats" collection with ops.quant.calibrate before inference.
PERFORMANCE_INT8_STATIC = dataclasses.replace(
    PERFORMANCE, quant="int8_static"
)

DEFAULT = Policy()

"""Typed configuration for the TPU-native ViT-CAM framework.

The reference (Jingfeng-Tang/vision_transformer_cam) scatters its magic constants
through the code: mask threshold 0.25 (vit_model.py:339), mask logit value -100
(vit_model.py:361), top-k 16 patches (vit_model.py:377), mask layer cutoffs 4/5
(vit_model.py:118,325), classifier threshold 0.9 (validate.py:133), cosine
foreground threshold 0.5 (validate.py:184), rollout background threshold 0.05
(validate.py:244), heatmap blend 0.3/0.5 (utils.py:114).  Here they all live in
one frozen dataclass tree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTCAMConfig:
    """Model + CAM-mechanism configuration.

    Mirrors the constructor surface of the reference VisionTransformer
    (vit_model.py:214-301) plus the CAM mechanism constants, expressed
    TPU-first (static shapes, explicit dtypes).
    """

    # --- architecture (vit_model.py:215-219) ---
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 20
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    representation_size: Optional[int] = None  # pre_logits layer if set
    distilled: bool = False

    # --- regularization (all default 0 in the config of record) ---
    drop_ratio: float = 0.0
    attn_drop_ratio: float = 0.0
    drop_path_ratio: float = 0.0

    # --- CAM / attention-mask mechanism (vit_model.py:118,319-361,363-394) ---
    # Mask is (re)computed at the end of every block with index >= mask_from
    # and additively applied (value mask_value on bg-involving pairs) to every
    # block with index > mask_from.
    mask_from: int = 4
    mask_threshold: float = 0.25
    mask_value: float = -100.0
    top_k_patches: int = 16
    # Reference normalizes the rollout cls-row by the *batch-global* max
    # (vit_model.py:335,372).  Set True for per-sample normalization instead.
    per_sample_mask_norm: bool = False

    # --- numerics ---
    ln_eps: float = 1e-6  # vit_model.py:244
    dtype: jnp.dtype = jnp.float32       # activation dtype
    param_dtype: jnp.dtype = jnp.float32

    # --- implementation switches ---
    attn_impl: str = "xla"  # "xla" | "pallas"
    # Matmul pass precision for f32 graphs.  None = backend default, which
    # on TPU lowers f32 dots to bfloat16 MXU passes: the f32-dtype graph
    # then deviates ~5e-3 (CAM max, ViT-B) from a float64 reference —
    # measured, see BENCHMARKS "f32 fidelity on TPU" (round-4 re-measure).
    # "highest" runs true f32 passes; "high" (3-pass bf16x3) lands in the
    # SAME fidelity class (same-chip diff 7.2e-7 Pallas / 5.9e-5 XLA) at
    # ~1.7x the throughput — the strict-parity recommendation.  Mosaic has
    # no HIGH dot lowering, so at "high" the Pallas kernels run their
    # in-kernel dots at "highest" (hybrid) and training routes to XLA.
    # Applied as jax.default_matmul_precision around the forward trace, so
    # it reaches XLA dots AND the Pallas kernels' in-kernel matmuls.
    # Irrelevant under bf16/int8 serving.
    matmul_precision: Optional[str] = None
    # tanh-approx GELU is measurably cheaper on the VPU; exact erf is the
    # parity default (torch nn.GELU default — vit_model.py:156)
    gelu_approx: bool = False
    # rematerialize each block in the backward pass (jax.checkpoint on the
    # scan body) — trades ~1/3 more FLOPs for O(depth) less activation HBM
    remat: bool = True
    # serving mode: clamp softmax logits to +-80 instead of the row-max
    # subtraction (saves a reduce pass per head; exact while |logit| < 80)
    softmax_clamp: bool = False
    # v3 whole-sub-block kernel (qkv GEMM + attention + proj + residual in
    # one program).  Measured SLOWER than v2 at ViT-B batch 512 (3528 vs
    # 3710 img/s — XLA's flattened batched GEMM beats the per-program one);
    # kept as a knob for shapes where weight residency wins.
    attn_block_fusion: bool = False
    # serving: fuse fc1+GELU+fc2 into one Pallas kernel so the [B*N, 4C]
    # hidden tensor never round-trips HBM (~1.2 GB/layer bf16 at batch 512).
    # Inference-only (no VJP); training keeps the XLA path.
    mlp_fusion: bool = False
    # serving: when a GEMM param node carries int8 weights AND a static
    # calibrated activation scale, run it as a Pallas kernel that quantizes
    # the activation tile in-kernel (no int8 activation copy in HBM) and
    # uses the 2x int8 MXU path.  Off = XLA qlinear (ops/quant.py).
    int8_fused_gemm: bool = False
    # serving: int8 attention I/O — the qkv GEMM requantizes its output to
    # int8 (per-layer calibrated q/k/v scales), S = QK^T runs on the int8
    # MXU path inside the attention kernel (operands pre-quantized: no
    # quantize pass, unlike the measured-slower dynamic variant), and the
    # kernel emits int8 for the downstream int8 proj GEMM.  Requires
    # quantize_params(act_scales=...) params.  Softmax/mask/rollout stay f32.
    int8_attn_io: bool = False
    # serving: int8 attention OUTPUT only (the int8_hifi mode's lever) —
    # q/k/v stay float so the attention probabilities (and the rollout CAM
    # built from them) are full-fidelity, but the kernel emits its output
    # already requantized to the proj GEMM's static act_scale: the bf16
    # attn-out tensor and the separate proj-input quantize pass never exist
    # in HBM.  Rounds from the in-kernel f32 accumulator, i.e. lands on the
    # same int8 grid as (or closer to f32 than) quantizing the bf16 output
    # outside.  Ignored when int8_attn_io already applies.
    int8_attn_out: bool = False
    # images per attention-kernel program.  0 = auto: 2 under int8 I/O
    # (the int8 qkv block is half the bf16 VMEM, and block_b=2 measured
    # 4.38 vs 4.58 ms/layer with rollout), 1 otherwise (bf16 measured
    # slower at block_b>1: 3279 vs 3365 img/s end-to-end).
    attn_block_b: int = 0
    # query rows per attention-kernel block.  0 = auto: min(N, 512), except
    # int8 at N > 512 (the extra int32 S buffer blows the 16 MB scoped-VMEM
    # limit at ViT-L@384's N=577): 384 there, or 224 when the [N,N] rollout
    # is also fused into the kernel (kernels/attention.py has the sweep
    # notes).  Tuning knob for long-sequence shapes.
    attn_q_block: int = 0
    # serving: compute the rollout CAM as a post-scan reversed vector chain
    # over the stacked per-layer head-mean matrices instead of carrying the
    # [B, N, N] joint product through the scan.  The final CAM is ROW 0 of
    # J = A_12 @ ... @ A_1 (predict.py:222-232), so
    # row = ((e_cls A_12) A_11) ... A_1 is a [B, N] vector-matrix chain:
    # each scan layer then only WRITES its head-mean matrix (no [N, N] read,
    # no [N, N] x [N, N] matmul in the hot loop).  Same math, different
    # association order.  Inference-only knob.  None = auto: ON for long
    # sequences (N > 512, e.g. ViT-L@384's 577 tokens), where the 8.5x
    # heavier joint carry flips the round-2 "wash at N=197" verdict
    # (467.9 vs 453 img/s measured) AND the fused-rollout int8 kernel is
    # VMEM-critical; OFF at short N where the in-scan fused rollout wins.
    rollout_post: Optional[bool] = None
    # serving: fuse each LayerNorm with the downstream GEMM's static int8
    # activation quantize into ONE Pallas pass (kernels/gemm.ln_quant) —
    # in the int8 scan both LN outputs feed only quantized GEMMs, so the
    # bf16 LN result is pure intermediate HBM traffic.  Requires int8
    # params with static act_scales; no-op otherwise.
    ln_quant_fusion: bool = False
    # multi-device serving: name of the mesh axis the batch is sharded over
    # (e.g. "data").  When set, the Pallas attention kernels are wrapped in
    # jax.shard_map over that axis so each device runs the kernel on its own
    # batch shard — XLA's auto-SPMD partitioner otherwise REPLICATES
    # pallas_call (it all-gathers the operands and every device redoes the
    # full batch).  The jit must be traced under the mesh context
    # (`with mesh:`), which supplies shard_map's mesh.  Inference knob; the
    # sharded entry points (validate/export --data_parallel) set it when
    # attn_impl == "pallas".
    data_axis: Optional[str] = None
    # multi-device long-sequence serving: name of the mesh axis the TOKEN
    # (sequence) dimension is sharded over (e.g. "seq").  Sequence
    # parallelism for shapes where the per-device [B, N, N] attention /
    # rollout footprint is the limit (ViT-L@384's N=577, or batch-1 latency
    # serving): the residual stream, bg indicator and rollout joint are
    # sharded over N via GSPMD sharding constraints; XLA inserts the
    # all-gather of K/V rows for each attention (Megatron-SP-style) and the
    # psum for the rollout joint contraction over ICI.  XLA-attention path
    # only — the Pallas kernels' shard_map wrap is batch-axis (data_axis);
    # forward() raises if both are requested.  Composes with data_axis
    # (batch over data x tokens over seq).
    seq_axis: Optional[str] = None

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def num_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def seq_len(self) -> int:
        return self.num_patches + self.num_tokens

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def scale(self) -> float:
        return self.qk_scale if self.qk_scale is not None else self.head_dim ** -0.5

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def has_logits(self) -> bool:
        return self.representation_size is not None and not self.distilled

    def replace(self, **kw) -> "ViTCAMConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """VOC12 data pipeline configuration (voc12/data.py, transforms at
    train_and_validate.py:63-69)."""

    voc12_root: str = ""
    img_name_list_path: str = ""
    cls_labels_path: str = ""  # cls_labels.npy; derived from voc12 dir if empty
    img_size: int = 224
    # ImageNet normalization, exactly the reference's constants
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    batch_size: int = 32
    shuffle: bool = True
    drop_last: bool = True
    seg_labels: bool = False
    num_threads: int = 4
    # C++ batched JPEG pipeline (explicit opt-in — matches PIL within ~2
    # uint8 quanta; the PIL default is the exact reference-parity pipeline)
    native_decode: bool = False
    prefetch: int = 2
    seed: int = 0
    loader_impl: str = "auto"  # "auto" | "native" | "pil"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """timm create_optimizer/create_scheduler-compatible hyperparameters
    (train_and_validate.py:214-251)."""

    opt: str = "adamw"
    lr: float = 5e-4
    # The entry scales lr by batch/512 (train_and_validate.py:148-149)
    linear_lr_scaling: bool = True
    opt_eps: float = 1e-8
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.05
    clip_grad: Optional[float] = None
    sched: str = "cosine"
    epochs: int = 1000
    warmup_epochs: int = 5
    warmup_lr: float = 1e-6
    min_lr: float = 1e-5
    cooldown_epochs: int = 10
    decay_epochs: float = 30
    decay_rate: float = 0.1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    batch_size: int = 16
    seed: int = 0
    freeze_backbone: bool = False  # train_and_validate.py:130-137
    log_every: int = 50
    ckpt_dir: str = "./weights"
    mesh_shape: Tuple[int, ...] = (-1,)  # data-parallel by default
    mesh_axes: Tuple[str, ...] = ("data",)
    # gradient accumulation: microbatches per optimizer step (exact
    # full-batch semantics — the dual MLSM loss is a sample mean)
    grad_accum: int = 1
    # ZeRO-1: shard the adamw moments over the 'data' axis
    # (parallel/mesh.zero1_opt_pspecs); params stay replicated/tp-sharded
    zero1: bool = False
    # pipeline parallelism: number of stages over a 'stage' mesh axis
    # (parallel/pipeline.pipeline_train_step); 0 = off.  Requires
    # per_sample_mask_norm (set by the train entry) and zero drop ratios
    # (the pipeline blocks take no dropout RNG).
    pipeline: int = 0
    # microbatches per pipeline step; 0 = the stage count (smallest fill)
    pp_microbatches: int = 0


@dataclasses.dataclass(frozen=True)
class PseudoSegConfig:
    """validate.py pseudo-segmentation constants (validate.py:133,184,244)."""

    cls_threshold: float = 0.9
    fg_cos_threshold: float = 0.5
    bg_rollout_threshold: float = 0.05
    bg_blocks_from: int = 5  # rollout bg mask uses blocks 6..12 (validate.py:227)


# ---------------------------------------------------------------------------
# Model zoo: the 8 factory configurations of vit_model.py:445-577
# ---------------------------------------------------------------------------

def vit_base_patch16_224(num_classes: int = 1000) -> ViTCAMConfig:
    """vit_model.py:445-459"""
    return ViTCAMConfig(img_size=224, patch_size=16, embed_dim=768, depth=12,
                        num_heads=12, representation_size=None,
                        num_classes=num_classes)


def vit_base_patch16_224_in21k(num_classes: int = 21843,
                               has_logits: bool = True) -> ViTCAMConfig:
    """vit_model.py:462-476 — the flagship model used by all entries."""
    return ViTCAMConfig(img_size=224, patch_size=16, embed_dim=768, depth=12,
                        num_heads=12,
                        representation_size=768 if has_logits else None,
                        num_classes=num_classes)


def vit_base_patch32_224(num_classes: int = 1000) -> ViTCAMConfig:
    """vit_model.py:479-493"""
    return ViTCAMConfig(img_size=224, patch_size=32, embed_dim=768, depth=12,
                        num_heads=12, representation_size=None,
                        num_classes=num_classes)


def vit_base_patch32_224_in21k(num_classes: int = 21843,
                               has_logits: bool = True) -> ViTCAMConfig:
    """vit_model.py:496-510"""
    return ViTCAMConfig(img_size=224, patch_size=32, embed_dim=768, depth=12,
                        num_heads=12,
                        representation_size=768 if has_logits else None,
                        num_classes=num_classes)


def vit_large_patch16_224(num_classes: int = 1000) -> ViTCAMConfig:
    """vit_model.py:513-527"""
    return ViTCAMConfig(img_size=224, patch_size=16, embed_dim=1024, depth=24,
                        num_heads=16, representation_size=None,
                        num_classes=num_classes)


def vit_large_patch16_224_in21k(num_classes: int = 21843,
                                has_logits: bool = True) -> ViTCAMConfig:
    """vit_model.py:530-544"""
    return ViTCAMConfig(img_size=224, patch_size=16, embed_dim=1024, depth=24,
                        num_heads=16,
                        representation_size=1024 if has_logits else None,
                        num_classes=num_classes)


def vit_large_patch16_384(num_classes: int = 1000) -> ViTCAMConfig:
    """High-res config (BASELINE.json config #4): 384px -> 577 tokens.
    Exceeds the reference's own fixed-size capability; pos-embed interpolation
    in io/weights.py makes 224-trained weights loadable."""
    return ViTCAMConfig(img_size=384, patch_size=16, embed_dim=1024, depth=24,
                        num_heads=16, representation_size=None,
                        num_classes=num_classes)


def vit_large_patch16_512(num_classes: int = 1000) -> ViTCAMConfig:
    """>1k-token config (BASELINE.json config #4 names ">1k tokens" as the
    long-context stress): 512px / patch 16 -> 32x32 grid, N = 1025.  No
    reference factory exists at this size; pos-embed interpolation
    (io/weights.py) makes 224/384-trained weights loadable."""
    return ViTCAMConfig(img_size=512, patch_size=16, embed_dim=1024, depth=24,
                        num_heads=16, representation_size=None,
                        num_classes=num_classes)


def vit_large_patch32_224_in21k(num_classes: int = 21843,
                                has_logits: bool = True) -> ViTCAMConfig:
    """vit_model.py:547-561"""
    return ViTCAMConfig(img_size=224, patch_size=32, embed_dim=1024, depth=24,
                        num_heads=16,
                        representation_size=1024 if has_logits else None,
                        num_classes=num_classes)


def vit_huge_patch14_224_in21k(num_classes: int = 21843,
                               has_logits: bool = True) -> ViTCAMConfig:
    """vit_model.py:564-577"""
    return ViTCAMConfig(img_size=224, patch_size=14, embed_dim=1280, depth=32,
                        num_heads=16,
                        representation_size=1280 if has_logits else None,
                        num_classes=num_classes)


MODEL_ZOO = {
    "vit_base_patch16_224": vit_base_patch16_224,
    "vit_base_patch16_224_in21k": vit_base_patch16_224_in21k,
    "vit_base_patch32_224": vit_base_patch32_224,
    "vit_base_patch32_224_in21k": vit_base_patch32_224_in21k,
    "vit_large_patch16_224": vit_large_patch16_224,
    "vit_large_patch16_224_in21k": vit_large_patch16_224_in21k,
    "vit_large_patch16_384": vit_large_patch16_384,
    "vit_large_patch16_512": vit_large_patch16_512,
    "vit_large_patch32_224_in21k": vit_large_patch32_224_in21k,
    "vit_huge_patch14_224_in21k": vit_huge_patch14_224_in21k,
}

# the reference's --model_name value (train_and_validate.py:219) maps to
# the one factory all three entries build (vit_model.py:462-476)
MODEL_ALIASES = {"vit_base": "vit_base_patch16_224_in21k"}


def resolve_model(name: str):
    """Zoo factory for `name`, honoring the reference's 'vit_base' alias.
    Unknown names RAISE — a silent ViT-B fallback ran (and reported metrics
    for) the wrong architecture on a typo (review finding)."""
    key = MODEL_ALIASES.get(name, name)
    if key not in MODEL_ZOO:
        raise SystemExit(
            f"unknown model_name {name!r}; choose from "
            f"{sorted(MODEL_ZOO) + sorted(MODEL_ALIASES)}")
    return MODEL_ZOO[key]

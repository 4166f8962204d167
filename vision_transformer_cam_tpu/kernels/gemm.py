"""Fused GEMM kernels for the serving path.

Two HBM-bandwidth problems in the XLA-lowered ViT block (reference GEMMs at
vit_model.py:98,110,151-153):

  * the MLP hidden tensor [B*N, 4C] (~620 MB bf16 at the headline batch)
    makes a full HBM round trip between fc1 and fc2 — `mlp_fused` keeps it
    in VMEM, tiled over rows, with the GELU applied in-register;
  * the int8 serving mode quantizes activations in XLA, materializing an
    int8 copy of every GEMM input in HBM — the `*_int8` kernels quantize
    in-kernel from the bf16 tile already resident in VMEM (static
    calibrated scales: no runtime absmax reduction), run the matmul on the
    int8 MXU path (2x bf16 rate on v5e), and dequantize in the epilogue.

Weights use symmetric per-output-channel scales (ops/quant.quantize_weight);
activations use static per-tensor scales (ops/quant.calibrate_act_scales).
Weight blocks have a constant index across the row grid, so Mosaic keeps
them VMEM-resident across programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _quantize_tile(x, inv_scale):
    """bf16/f32 tile -> int8 with a static scale (round-to-nearest-even like
    jnp.round, matching ops.quant.qlinear)."""
    xs = x.astype(jnp.float32) * inv_scale
    return jnp.clip(jnp.round(xs), -127.0, 127.0).astype(jnp.int8)


# ---------------------------------------------------------------------------
# fused MLP: out = fc2(gelu(fc1(x)))  — hidden never leaves VMEM
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, **kw):
    gelu_approx = kw["gelu_approx"]
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[0], approximate=gelu_approx)
    out = jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                  preferred_element_type=jnp.float32) + b2_ref[0]
    o_ref[:] = out.astype(o_ref.dtype)


def _mlp_int8_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, s2_ref,
                     a_ref, o_ref, **kw):
    gelu_approx = kw["gelu_approx"]
    inv_a1, inv_a2 = a_ref[0, 0], a_ref[0, 1]
    xq = _quantize_tile(x_ref[:], inv_a1)
    acc1 = jnp.dot(xq, w1_ref[:], preferred_element_type=jnp.int32)
    # s1 is the COMBINED scale act_scale1 * weight_scale1 [1, HID]
    h = jax.nn.gelu(acc1.astype(jnp.float32) * s1_ref[0] + b1_ref[0],
                    approximate=gelu_approx)
    hq = _quantize_tile(h, inv_a2)
    acc2 = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
    out = acc2.astype(jnp.float32) * s2_ref[0] + b2_ref[0]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gelu_approx", "block_m",
                                             "interpret"))
def mlp_fused(x, w1, b1, w2, b2, *, gelu_approx: bool = True,
              block_m: int = 512, interpret: bool = False):
    """x: [..., C] float; w1 [C, HID], w2 [HID, C].  Returns [..., C]."""
    shape = x.shape
    c, hid = w1.shape
    m = 1
    for s in shape[:-1]:
        m *= s
    x2 = x.reshape(m, c)
    mp = _round_up(m, block_m)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    kernel = functools.partial(_mlp_kernel, gelu_approx=gelu_approx)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * c * hid,
            bytes_accessed=2 * mp * c * x.dtype.itemsize
            + 2 * c * hid * w1.dtype.itemsize,
            transcendentals=mp * hid),
        interpret=interpret,
    )(x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:m].reshape(shape)


@functools.partial(jax.jit, static_argnames=("gelu_approx", "block_m",
                                             "interpret", "out_dtype"))
def mlp_fused_int8(x, w1q, cs1, b1, w2q, cs2, b2, inv_a1, inv_a2, *,
                   gelu_approx: bool = True, block_m: int = 512,
                   out_dtype=jnp.bfloat16, interpret: bool = False):
    """Int8 W8A8 fused MLP with in-kernel activation quantization.

    w1q/w2q: int8 kernels; cs1/cs2: combined scales (act * per-channel
    weight) [1, HID]/[1, C] f32; inv_a1/inv_a2: 1/act_scale scalars (f32).
    """
    shape = x.shape
    c, hid = w1q.shape
    m = 1
    for s in shape[:-1]:
        m *= s
    x2 = x.reshape(m, c)
    mp = _round_up(m, block_m)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    inv_a = jnp.stack([jnp.asarray(inv_a1, jnp.float32),
                       jnp.asarray(inv_a2, jnp.float32)]).reshape(1, 2)
    kernel = functools.partial(_mlp_int8_kernel, gelu_approx=gelu_approx)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * c * hid,
            bytes_accessed=2 * mp * c * x.dtype.itemsize + 2 * c * hid,
            transcendentals=mp * hid),
        interpret=interpret,
    )(x2, w1q, b1.astype(jnp.float32).reshape(1, -1), w2q,
      b2.astype(jnp.float32).reshape(1, -1), cs1.reshape(1, -1),
      cs2.reshape(1, -1), inv_a)
    return out[:m].reshape(shape)


# ---------------------------------------------------------------------------
# fused LayerNorm -> int8 quantize (the serving scan's LN-adjacent passes)
# ---------------------------------------------------------------------------

def _ln_quant_kernel(x_ref, g_ref, b_ref, s_ref, o_ref, **kw):
    eps = kw["eps"]
    x = x_ref[:].astype(jnp.float32)                       # [BM, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0] + b_ref[0]
    o_ref[:] = jnp.clip(jnp.round(y * s_ref[0, 0]), -127.0, 127.0
                        ).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "interpret"))
def ln_quant(x, scale, bias, *, eps: float, inv_a, block_m: int = 1024,
             interpret: bool = False):
    """int8 = quantize(layer_norm(x)): LN and the static-scale activation
    quantize in ONE row-tiled pass — the tokens tensor is read once (bf16)
    and written once (int8).  In the int8 serving scan both LayerNorms feed
    ONLY a quantized GEMM, so the bf16 LN output is pure intermediate
    traffic; XLA materializes it ([B, N, C] write + read, ~0.66 ms/layer of
    clamp_convert in the round-2 device profile) because the quantize lives
    inside the downstream qlinear's fusion, not the LN's.

    x: [..., C]; scale/bias: [C] LN affine params; inv_a: 1/act_scale of
    the consuming GEMM (f32 scalar).  Exact same math as
    models.vit._layer_norm followed by ops.quant's static quantize.
    """
    shape = x.shape
    c = shape[-1]
    m = 1
    for s in shape[:-1]:
        m *= s
    x2 = x.reshape(m, c)
    mp = _round_up(m, block_m)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    inv_a = jnp.asarray(inv_a, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=8 * mp * c,
            bytes_accessed=mp * c * x.dtype.itemsize + mp * c,
            transcendentals=0),
        interpret=interpret,
    )(x2, scale.astype(jnp.float32).reshape(1, -1),
      bias.astype(jnp.float32).reshape(1, -1), inv_a)
    return out[:m].reshape(shape)


# ---------------------------------------------------------------------------
# int8 linear with fused quantize epilogue (qkv / proj / patch-embed)
# ---------------------------------------------------------------------------

def _linear_int8_kernel(x_ref, w_ref, b_ref, cs_ref, a_ref, o_ref, **kw):
    xq = _quantize_tile(x_ref[:], a_ref[0, 0])
    acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * cs_ref[0] + b_ref[0]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret",
                                             "out_dtype"))
def linear_int8_fused(x, wq, cs, b, inv_a, *, block_m: int = 512,
                      out_dtype=jnp.bfloat16, interpret: bool = False):
    """y = dequant(quant(x) @ wq) + b with the activation quantize fused into
    the GEMM kernel (no int8 activation copy in HBM).

    x: [..., K] float; wq: [K, N] int8; cs: combined scale [1, N] f32
    (act_scale * per-channel weight scale); b: [N] or None (qkv_bias=False
    trees store bias=None); inv_a: 1/act_scale.
    """
    shape = x.shape
    k, n = wq.shape
    if b is None:
        b = jnp.zeros((n,), jnp.float32)
    m = 1
    for s in shape[:-1]:
        m *= s
    x2 = x.reshape(m, k)
    mp = _round_up(m, block_m)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    inv_a = jnp.asarray(inv_a, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        _linear_int8_kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * x.dtype.itemsize + k * n
            + mp * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(x2, wq, b.astype(jnp.float32).reshape(1, -1), cs.reshape(1, -1), inv_a)
    return out[:m].reshape(shape[:-1] + (n,))

"""Pseudo semantic-segmentation label generation (validate.py:123-262).

The reference runs this at batch_size=1 with Python loops over classes,
features and patches, plus two explicit 16x and 768x loops on GPU tensors
(validate.py:137-208).  Here the whole resolution-independent part is ONE
jitted batched function:

  1. class gating: sigmoid(head1) >= cls_threshold (validate.py:132-134);
  2. feature->class: argmax over gated head1 weights (:135-143);
  3. feature->patch: argmax contribution over the 16 gathered patch
     embeddings (:145-148);
  4. patch->class via the torch.mode trick (:146-153) — reimplemented as a
     count histogram (smallest-of-most-frequent tie-break, exactly
     torch.mode), with the reference's arange-filler fallback 21+p for
     patches no feature maps to;
  5. cosine similarity maps of each top-16 patch vs all 196 patches at grid
     resolution (:163-174);
  6. background rollout row over blocks [bg_blocks_from:] (:224-235).

Only the per-image bilinear upsample to the ORIGINAL image size and the
final thresholded composition (:177-257) run on host, because VOC images
have per-image shapes (dynamic shapes don't jit); that part is vectorized
numpy, not Python-per-pixel.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformer_cam_tpu.configs import PseudoSegConfig, ViTCAMConfig
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.ops.rollout import bg_rollout_row


class PseudoSegDeviceOut(NamedTuple):
    patch_to_cls: jax.Array   # [B, K] int32 — class id per top-K patch, or
    #                           the reference's filler 21+p fallback
    cos_maps: jax.Array       # [B, K, g, g] cosine similarity maps
    bg_row: jax.Array         # [B, g, g] rollout bg weights in [0, 1]


def _patch_class_assignment(probs, head1_kernel_t, top_embeds, cls_threshold):
    """Steps 1-4 above.  probs [B,C]; head1_kernel_t [C,D] (torch layout:
    class-major, = ours transposed); top_embeds [B,K,D]."""
    b, k, d = top_embeds.shape
    c = probs.shape[-1]
    predcls = (probs >= cls_threshold)                       # [B, C]
    # zero non-predicted class rows to -10 (validate.py:135-142)
    gated = jnp.where(predcls[:, :, None], head1_kernel_t[None], -10.0)
    cls_to_feat = jnp.argmax(gated, axis=1)                  # [B, D] class/ft
    contrib = jnp.argmax(top_embeds, axis=1)                 # [B, D] patch/ft
    # histogram: counts[b, p, cl] = #features assigned patch p with class cl
    onehot_p = jax.nn.one_hot(contrib, k, dtype=jnp.float32)     # [B, D, K]
    onehot_c = jax.nn.one_hot(cls_to_feat, c, dtype=jnp.float32)  # [B, D, C]
    counts = jnp.einsum("bdp,bdc->bpc", onehot_p, onehot_c)
    # torch.mode tie-break = smallest of the most frequent values; class ids
    # always < the arange fillers, so: if any feature lands on the patch the
    # smallest argmax class wins (jnp.argmax returns the first maximum),
    # else the untouched filler column minimum num_classes+1+p — 21+p for
    # the reference's 20 classes (validate.py:146); basing it on c keeps
    # fillers collision-free when num_classes > 20.
    best = jnp.argmax(counts, axis=-1).astype(jnp.int32)         # [B, K]
    has_any = jnp.sum(counts, axis=-1) > 0
    filler = (c + 1) + jnp.arange(k, dtype=jnp.int32)[None, :]
    return jnp.where(has_any, best, filler)


@functools.partial(jax.jit, static_argnames=("cfg", "pcfg"))
def pseudo_seg_device(out: vit.ViTCAMOutput, cfg: ViTCAMConfig,
                      pcfg: PseudoSegConfig) -> PseudoSegDeviceOut:
    """The batched, resolution-independent device math."""
    g = cfg.grid_size
    probs = jax.nn.sigmoid(out.head1_logits)
    patch_to_cls = _patch_class_assignment(
        probs, out.head1_kernel.T, out.top_patch_embeds, pcfg.cls_threshold)

    # cosine maps (validate.py:163-174): L2-normalize final-block patch
    # embeddings (pre final-norm) and the K gathered embeddings
    patch_embed = out.tokens_prenorm[:, cfg.num_tokens:, :]      # [B, P, D]
    # torch F.normalize clamps the norm at 1e-12 (validate.py:168-169) — a
    # zero-norm row must yield 0.0 cosines, not NaN
    pe = patch_embed / jnp.linalg.norm(
        patch_embed, axis=-1, keepdims=True).clip(1e-12)
    he = out.top_patch_embeds / jnp.linalg.norm(
        out.top_patch_embeds, axis=-1, keepdims=True).clip(1e-12)
    cos = jnp.einsum("bkd,bpd->bkp", he, pe)                     # [B, K, P]
    cos_maps = cos.reshape(cos.shape[0], cos.shape[1], g, g)

    bg = bg_rollout_row(out.attn_cls_rows, pcfg.bg_blocks_from,
                        prefix_tokens=cfg.num_tokens)           # [B, P]
    bg_row = bg.reshape(bg.shape[0], g, g)
    return PseudoSegDeviceOut(patch_to_cls, cos_maps, bg_row)


def np_bilinear_resize(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) in numpy:
    half-pixel centers, edge clamp, no antialias.  x: [..., H, W]."""
    h, w = x.shape[-2:]
    oh, ow = size
    ys = (np.arange(oh) + 0.5) * (h / oh) - 0.5
    xs = (np.arange(ow) + 0.5) * (w / ow) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)
    wx = np.clip(xs - x0, 0.0, 1.0)
    # Separable two-pass form — BIT-IDENTICAL to the naive 4-gather form
    # (same lerp expressions in the same order: out = top + (bot-top)*wy
    # where top/bot are the W-lerped source rows) but ~3x cheaper: the W
    # pass runs once per SOURCE row (h of them) instead of once per output
    # row (oh of them, each source row redone oh/h times), and the H pass
    # gathers 2 full-size arrays instead of 4.  This is the hot op of the
    # BASELINE-config-#3 host pipeline (BENCHMARKS "End-to-end").
    left = x[..., :, x0]
    right = x[..., :, x1]
    rows = left + (right - left) * wx                   # [..., h, ow]
    top = rows[..., y0, :]
    bot = rows[..., y1, :]
    return top + (bot - top) * wy[:, None]


def _narrow_seg(seg: np.ndarray) -> np.ndarray:
    # uint8 is the palette-PNG contract (VOC: ids <= 2*20+K+2); filler ids
    # from a num_classes large enough to overflow it would WRAP into
    # valid-looking foreground classes — keep int64 there instead
    return seg.astype(np.uint8) if seg.max(initial=0) < 256 \
        else seg.astype(np.int64)


def compose_pseudo_seg(patch_to_cls: np.ndarray, cos_maps: np.ndarray,
                       bg_row: np.ndarray, size: Tuple[int, int],
                       pcfg: PseudoSegConfig,
                       allow_native: bool = True) -> np.ndarray:
    """Per-image host composition (validate.py:177-257) at the original
    (h, w): upsample the K cosine maps + bg row, argmax/threshold, map patch
    ids to classes (+1 foreground offset), gate by fg and bg masks.

    Routes through the native fused kernel (native/vitcam_io.cc
    vitcam_compose_one — all-double, same lerp expression order, so outputs
    are bit-identical; tests/test_pseudo_seg.py pins both paths against the
    torch transliteration) when the library is available; the numpy below
    is the reference implementation and the fallback."""
    if allow_native:
        from vision_transformer_cam_tpu.io import native_loader
        if native_loader.compose_available():
            return _narrow_seg(native_loader.compose_batch(
                np.asarray(cos_maps)[None], np.asarray(bg_row)[None],
                np.asarray(patch_to_cls)[None], [size],
                pcfg.fg_cos_threshold, pcfg.bg_rollout_threshold,
                num_threads=1)[0])
    cos_up = np_bilinear_resize(cos_maps.astype(np.float64), size)  # [K,h,w]
    winner = np.argmax(cos_up, axis=0)                              # [h, w]
    winner_v = np.max(cos_up, axis=0)
    fg = winner_v >= pcfg.fg_cos_threshold                          # :184-186
    bg_up = np_bilinear_resize(bg_row.astype(np.float64), size)
    bg = bg_up >= pcfg.bg_rollout_threshold                         # :244-246
    seg = patch_to_cls.astype(np.int64)[winner] + 1                 # :190-208
    seg = seg * fg * bg                                             # :248-257
    return _narrow_seg(seg)


def pseudo_seg_batch(out: vit.ViTCAMOutput, cfg: ViTCAMConfig,
                     pcfg: PseudoSegConfig,
                     sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
    """Full pipeline for a batch: device math once, host composition per
    image at its own original size (native threaded kernel when available,
    numpy fallback otherwise — same bits either way)."""
    dev = jax.device_get(pseudo_seg_device(out, cfg, pcfg))
    from vision_transformer_cam_tpu.io import native_loader
    if native_loader.compose_available():
        return [_narrow_seg(s) for s in native_loader.compose_batch(
            dev.cos_maps, dev.bg_row, dev.patch_to_cls, sizes,
            pcfg.fg_cos_threshold, pcfg.bg_rollout_threshold)]
    return [compose_pseudo_seg(dev.patch_to_cls[i], dev.cos_maps[i],
                               dev.bg_row[i], sizes[i], pcfg,
                               allow_native=False)
            for i in range(len(sizes))]

"""Minimal JAX ResNet (18/34-style basic blocks) for the classic CNN-CAM demo.

The reference's standalone t.py uses torchvision ResNet18 with a forward hook
on the last conv block + the fc weight matrix to form CAMs (t.py:55-75).
Here the forward simply RETURNS the last conv features alongside the logits —
the functional answer to a forward hook.  Weights load from an .npz pytree
(this environment has no network for torchvision's pretrained download).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

STAGES_18 = (2, 2, 2, 2)
WIDTHS = (64, 128, 256, 512)


def _conv(x, w, stride=1):
    # torch Conv2d pads symmetrically by (k-1)//2; XLA "SAME" pads
    # asymmetrically at stride 2 (e.g. (2,3) for the 7x7/s2 stem), which
    # shifts every window one pixel vs the torchvision weights' training
    # layout (review finding) — pad explicitly like torch
    ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    # inference-style batchnorm: folded running stats
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def init(key, num_classes: int = 1000, stages: Sequence[int] = STAGES_18,
         dtype=jnp.float32):
    keys = iter(jax.random.split(key, 128))

    def conv_p(kh, kw, cin, cout):
        fan = kh * kw * cin
        return (jax.random.normal(next(keys), (kh, kw, cin, cout))
                * jnp.sqrt(2.0 / fan)).astype(dtype)

    def bn_p(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    params = {"stem": {"conv": conv_p(7, 7, 3, 64), "bn": bn_p(64)},
              "stages": []}
    cin = 64
    for si, (blocks, cout) in enumerate(zip(stages, WIDTHS)):
        stage = []
        for bi in range(blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            blk = {"conv1": conv_p(3, 3, cin, cout), "bn1": bn_p(cout),
                   "conv2": conv_p(3, 3, cout, cout), "bn2": bn_p(cout)}
            if stride != 1 or cin != cout:
                blk["down"] = {"conv": conv_p(1, 1, cin, cout),
                               "bn": bn_p(cout)}
            stage.append(blk)
            cin = cout
        params["stages"].append(stage)
    params["fc"] = {"kernel": (jax.random.normal(next(keys),
                                                 (cin, num_classes))
                               * 0.01).astype(dtype),
                    "bias": jnp.zeros((num_classes,), dtype)}
    return params


@functools.partial(jax.jit, static_argnames=())
def apply(params, x):
    """x: [B, H, W, 3].  Returns (logits [B, nc], features [B, h, w, C]) —
    the last conv activations the reference hooks (t.py:78-86)."""
    x = x.astype(params["stem"]["conv"].dtype)
    y = _conv(x, params["stem"]["conv"], 2)
    y = jax.nn.relu(_bn(y, params["stem"]["bn"]))
    # torch MaxPool2d(3, 2, padding=1): symmetric, vs SAME's (0,1)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            r = blk["down"] if "down" in blk else None
            sc = _bn(_conv(y, r["conv"], stride), r["bn"]) if r else y
            y2 = jax.nn.relu(_bn(_conv(y, blk["conv1"], stride), blk["bn1"]))
            y2 = _bn(_conv(y2, blk["conv2"], 1), blk["bn2"])
            y = jax.nn.relu(y2 + sc)
    feats = y                                            # [B, h, w, 512]
    pooled = jnp.mean(feats, axis=(1, 2))
    logits = jnp.dot(pooled, params["fc"]["kernel"]) + params["fc"]["bias"]
    return logits, feats


def cam_weight(params):
    """[C, num_classes] CAM weight — the fc kernel (t.py:52's params[-2]);
    same accessor surface as models/squeezenet.py and models/densenet.py so
    the demo CLI dispatches over architectures generically."""
    return params["fc"]["kernel"]


def return_cam(features, fc_kernel, class_ids):
    """t.py:55-75: CAM_c = normalize(sum_k w[k,c] * feature_k) -> uint8.

    features: [h, w, C]; fc_kernel: [C, num_classes]; class_ids: ints.
    Returns [len(ids), h, w] uint8."""
    import numpy as np

    from vision_transformer_cam_tpu.cam.render import cam_norm
    feats = np.asarray(features).reshape(-1, features.shape[-1])  # [hw, C]
    cams = [cam_norm(
        (feats @ np.asarray(fc_kernel[:, c])).reshape(features.shape[:2]))
        for c in class_ids]
    return np.stack(cams)

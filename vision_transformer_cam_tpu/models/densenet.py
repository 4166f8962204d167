"""Minimal JAX DenseNet (161-style) for the classic CNN-CAM demo.

The reference's standalone t.py offers torchvision's densenet161 as
model_id 3 (t.py:31-33) with the CAM hook on its `features` module — the
post-final-norm, pre-relu tensor — and the CAM weight from the classifier
Linear (t.py:52, params[-2]).  Same architecture here as a pure function:
bn-relu-conv bottleneck dense layers (1x1 to 4k then 3x3 to k channels,
concatenated), half-width 1x1 + avgpool transitions, and `apply` returning
(logits, features) with `features` exactly the hooked tensor.  `init` is
parameterized (growth/blocks/init_features) so tests can run a tiny
instance; the default is the 161 config (growth 48, blocks 6/12/36/24).
Batchnorms are inference-style folded running stats, like models/resnet.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

BLOCKS_161 = (6, 12, 36, 24)


def _conv(x, w, stride=1):
    # symmetric torch-style (k-1)//2 padding — XLA "SAME" pads
    # asymmetrically at stride 2, shifting windows one pixel vs the
    # torchvision weights' layout (see models/resnet.py._conv)
    ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def init(key, num_classes: int = 1000, growth: int = 48,
         blocks: Sequence[int] = BLOCKS_161, init_features: int = 96,
         dtype=jnp.float32):
    keys = iter(jax.random.split(key, 512))

    def conv_p(kh, kw, cin, cout):
        fan = kh * kw * cin
        return (jax.random.normal(next(keys), (kh, kw, cin, cout))
                * jnp.sqrt(2.0 / fan)).astype(dtype)

    def bn_p(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    params = {"stem": {"conv": conv_p(7, 7, 3, init_features),
                       "bn": bn_p(init_features)},
              "blocks": [], "transitions": []}
    cin = init_features
    for bi, n_layers in enumerate(blocks):
        block = []
        for _ in range(n_layers):
            block.append({"bn1": bn_p(cin),
                          "conv1": conv_p(1, 1, cin, 4 * growth),
                          "bn2": bn_p(4 * growth),
                          "conv2": conv_p(3, 3, 4 * growth, growth)})
            cin += growth
        params["blocks"].append(block)
        if bi != len(blocks) - 1:
            cout = cin // 2
            params["transitions"].append({"bn": bn_p(cin),
                                          "conv": conv_p(1, 1, cin, cout)})
            cin = cout
    params["norm5"] = bn_p(cin)
    params["classifier"] = {"kernel": (jax.random.normal(
        next(keys), (cin, num_classes)) * 0.01).astype(dtype),
        "bias": jnp.zeros((num_classes,), dtype)}
    return params


@jax.jit
def apply(params, x):
    """x: [B, H, W, 3].  Returns (logits [B, nc], features [B, h, w, C]) —
    `features` is the post-norm5, PRE-relu tensor torchvision's `features`
    module emits, i.e. exactly what the reference hooks (t.py:31-33)."""
    x = x.astype(params["stem"]["conv"].dtype)
    y = jax.nn.relu(_bn(_conv(x, params["stem"]["conv"], 2),
                        params["stem"]["bn"]))
    # torch MaxPool2d(3, 2, padding=1): symmetric, vs SAME's (0,1)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    for bi, block in enumerate(params["blocks"]):
        for layer in block:
            h = _conv(jax.nn.relu(_bn(y, layer["bn1"])), layer["conv1"])
            h = _conv(jax.nn.relu(_bn(h, layer["bn2"])), layer["conv2"])
            y = jnp.concatenate([y, h], axis=-1)
        if bi < len(params["transitions"]):
            t = params["transitions"][bi]
            y = _conv(jax.nn.relu(_bn(y, t["bn"])), t["conv"])
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") * 0.25
    feats = _bn(y, params["norm5"])                      # hooked tensor
    pooled = jnp.mean(jax.nn.relu(feats), axis=(1, 2))
    logits = (jnp.dot(pooled, params["classifier"]["kernel"])
              + params["classifier"]["bias"])
    return logits, feats


def cam_weight(params):
    """[C, num_classes] CAM weight — the classifier Linear kernel
    (t.py:52's params[-2])."""
    return params["classifier"]["kernel"]

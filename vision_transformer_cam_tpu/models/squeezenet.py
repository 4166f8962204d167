"""Minimal JAX SqueezeNet 1.1 for the classic CNN-CAM demo.

The reference's standalone t.py offers torchvision's squeezenet1_1 as
model_id 1 (t.py:26-28) with the CAM hook on its `features` module and the
CAM weight taken from the 1x1 classifier conv (t.py:52, params[-2]).  Same
architecture here as a pure function: `apply` returns (logits, features)
where `features` is exactly the tensor the reference hooks (post-fire9,
before the classifier conv), and `cam_weight` is the [C, num_classes]
matrix `returnCAM` dots against (t.py:55-75).  Weights load from an .npz
pytree (no torchvision download in this environment).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# (squeeze, expand) channel plan of v1.1 and the maxpool positions: fires
# 2-3 after the first pool, 4-5 after the second, 6-9 after the third.
FIRES = ((16, 64), (16, 64), (32, 128), (32, 128),
         (48, 192), (48, 192), (64, 256), (64, 256))
POOL_BEFORE = (0, 2, 4)  # fire indices preceded by a 3x3/s2 maxpool


def _conv(x, w, b, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool(x):
    # torchvision squeezenet1_1: MaxPool2d(3, 2, ceil_mode=True) — the last
    # window may hang off the bottom/right edge as long as it STARTS in
    # bounds.  VALID (floor mode) coincides at 224 input but drops a row/
    # column of windows at other sizes (review finding); pad bottom/right
    # with -inf to realize exactly the ceil-mode output grid.
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - 3) // 2) + 1
    out_w = -(-(w - 3) // 2) + 1
    ph = max(0, (out_h - 1) * 2 + 3 - h)
    pw = max(0, (out_w - 1) * 2 + 3 - w)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1),
                                 [(0, 0), (0, ph), (0, pw), (0, 0)])


def init(key, num_classes: int = 1000, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))

    def conv_p(kh, kw, cin, cout):
        fan = kh * kw * cin
        w = (jax.random.normal(next(keys), (kh, kw, cin, cout))
             * jnp.sqrt(2.0 / fan)).astype(dtype)
        return {"kernel": w, "bias": jnp.zeros((cout,), dtype)}

    params = {"stem": conv_p(3, 3, 3, 64), "fires": []}
    cin = 64
    for (sq, ex) in FIRES:
        params["fires"].append({"squeeze": conv_p(1, 1, cin, sq),
                                "expand1": conv_p(1, 1, sq, ex),
                                "expand3": conv_p(3, 3, sq, ex)})
        cin = 2 * ex
    # the classifier is a 1x1 conv (t.py's params[-2] CAM weight source)
    params["classifier"] = conv_p(1, 1, cin, num_classes)
    return params


@jax.jit
def apply(params, x):
    """x: [B, H, W, 3].  Returns (logits [B, nc], features [B, h, w, 512])
    — `features` is the post-fire9 tensor the reference hooks (t.py:28)."""
    x = x.astype(params["stem"]["kernel"].dtype)
    y = jax.nn.relu(_conv(x, params["stem"]["kernel"],
                          params["stem"]["bias"], stride=2, padding="VALID"))
    for i, fire in enumerate(params["fires"]):
        if i in POOL_BEFORE:
            y = _maxpool(y)
        s = jax.nn.relu(_conv(y, fire["squeeze"]["kernel"],
                              fire["squeeze"]["bias"]))
        e1 = jax.nn.relu(_conv(s, fire["expand1"]["kernel"],
                               fire["expand1"]["bias"]))
        e3 = jax.nn.relu(_conv(s, fire["expand3"]["kernel"],
                               fire["expand3"]["bias"]))
        y = jnp.concatenate([e1, e3], axis=-1)
    feats = y                                            # [B, h, w, 512]
    # classifier: (eval-mode dropout) -> 1x1 conv -> relu -> global avgpool
    cls = jax.nn.relu(_conv(feats, params["classifier"]["kernel"],
                            params["classifier"]["bias"]))
    logits = jnp.mean(cls, axis=(1, 2))
    return logits, feats


def cam_weight(params):
    """[C, num_classes] CAM weight — the squeezed 1x1 classifier conv kernel
    (t.py:52's np.squeeze(params[-2]))."""
    return params["classifier"]["kernel"].reshape(
        params["classifier"]["kernel"].shape[-2:])

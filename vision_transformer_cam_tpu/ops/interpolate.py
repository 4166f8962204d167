"""Resize ops matching the reference's torch/torchvision semantics.

torch F.interpolate(mode='bilinear', align_corners=False) uses half-pixel
centers without antialiasing — identical to jax.image.resize(method='bilinear',
antialias=False) on upsampling (validate.py:177,239).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_resize(x, size):
    """x: [..., H, W] -> [..., size[0], size[1]], align_corners=False."""
    out_shape = x.shape[:-2] + tuple(size)
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)


def nearest_resize(x, size):
    """Nearest-neighbor resize (torchvision InterpolationMode.NEAREST).

    torchvision/PIL NEAREST picks src = floor(dst * scale) with scale =
    in/out — this is asymmetric (not half-pixel).  jax.image.resize 'nearest'
    uses half-pixel centers, so we index explicitly to match.
    """
    h, w = x.shape[-2:]
    oh, ow = size
    ri = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[..., ri[:, None], ci[None, :]]


def interpolate_pos_embed(pos_embed, old_grid, new_grid, num_tokens=1):
    """Bicubic pos-embed interpolation so 224-trained checkpoints load at
    other resolutions (capability the reference lacks — its pos_embed is a
    fixed-size parameter with a hard input assert, vit_model.py:69-70,252).

    pos_embed: [1, num_tokens + old_grid², D].
    """
    tok = pos_embed[:, :num_tokens]
    grid = pos_embed[:, num_tokens:]
    d = grid.shape[-1]
    grid = grid.reshape(1, old_grid, old_grid, d)
    grid = jax.image.resize(grid, (1, new_grid, new_grid, d), method="bicubic")
    grid = grid.reshape(1, new_grid * new_grid, d)
    return jnp.concatenate([tok, grid], axis=1)

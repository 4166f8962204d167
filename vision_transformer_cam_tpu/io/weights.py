"""Checkpoint interop.

The reference fine-tunes from timm's "jx_" ports of Google's JAX ViT weights
(.pth state dicts, train_and_validate.py:111-119) and saves plain
state_dict .pth files (train_and_validate.py:189-195).  This module maps a
torch state dict (as numpy) to/from our parameter pytree, including the
reference's head-key deletion surgery, so both pretrained and reference
fine-tuned checkpoints load natively.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from vision_transformer_cam_tpu.configs import ViTCAMConfig

# Model-level keys the reference carries but never uses in the forward pass
# (vit_model.py:292-293 norm1(256)/norm2(32)); skipped on import.
_DEAD_PREFIXES = ("norm1.", "norm2.")

# train_and_validate.py:115-116 / predict.py:120-122
DEFAULT_DEL_KEYS = ("head.weight", "head.bias")
PRETRAIN_DEL_KEYS = ("head.weight", "head.bias",
                     "pre_logits.fc.weight", "pre_logits.fc.bias")


def _t(w):  # torch Linear stores [out, in]; ours is [in, out]
    return np.ascontiguousarray(np.asarray(w).T)


def pytree_from_state_dict(sd: Dict[str, np.ndarray], cfg: ViTCAMConfig,
                           params: Optional[dict] = None,
                           del_keys: Sequence[str] = ()) -> dict:
    """Convert a torch-layout state dict (values as numpy arrays) to our
    pytree.  `params` supplies values for keys deleted/missing (the
    strict=False semantics of the reference load); if None, missing keys
    raise."""
    import jax.numpy as jnp

    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.startswith(_DEAD_PREFIXES) and k not in del_keys}

    def get(key, convert, fallback):
        if key in sd:
            return jnp.asarray(convert(sd[key]), dtype=cfg.param_dtype)
        if fallback is not None:
            return fallback
        raise KeyError(f"missing checkpoint key {key} and no init fallback")

    def fb(*path):
        node = params
        if node is None:
            return None
        for p in path:
            node = node[p]
        return node

    p, c, d = cfg.patch_size, cfg.in_chans, cfg.embed_dim
    out = {
        "patch_embed": {
            # conv [D,C,kh,kw] -> [kh,kw,C] x D matmul kernel
            "kernel": get("patch_embed.proj.weight",
                          lambda w: w.transpose(2, 3, 1, 0).reshape(p * p * c, d),
                          fb("patch_embed", "kernel")),
            "bias": get("patch_embed.proj.bias", lambda w: w,
                        fb("patch_embed", "bias")),
        },
        "cls_token": get("cls_token", lambda w: w, fb("cls_token")),
        "pos_embed": get("pos_embed", lambda w: w, fb("pos_embed")),
    }

    # Checkpoints trained at another resolution: bicubic-interpolate the grid
    # part of pos_embed (capability the reference lacks — its fixed-size
    # pos_embed hard-asserts the input size, vit_model.py:69-70,252).
    if out["pos_embed"].shape[1] != cfg.seq_len:
        from vision_transformer_cam_tpu.ops.interpolate import (
            interpolate_pos_embed)
        old_grid = int(round((out["pos_embed"].shape[1] -
                              cfg.num_tokens) ** 0.5))
        out["pos_embed"] = jnp.asarray(interpolate_pos_embed(
            out["pos_embed"], old_grid, cfg.grid_size,
            num_tokens=cfg.num_tokens), dtype=cfg.param_dtype)

    out.update({
        "norm": {"scale": get("norm.weight", lambda w: w, fb("norm", "scale")),
                 "bias": get("norm.bias", lambda w: w, fb("norm", "bias"))},
        "head": {"kernel": get("head.weight", _t, fb("head", "kernel")),
                 "bias": get("head.bias", lambda w: w, fb("head", "bias"))},
        "head1": {"kernel": get("head1.weight", _t, fb("head1", "kernel")),
                  "bias": get("head1.bias", lambda w: w, fb("head1", "bias"))},
    })
    if cfg.has_logits:
        out["pre_logits"] = {
            "kernel": get("pre_logits.fc.weight", _t,
                          fb("pre_logits", "kernel")),
            "bias": get("pre_logits.fc.bias", lambda w: w,
                        fb("pre_logits", "bias"))}
    if cfg.distilled:
        out["dist_token"] = get("dist_token", lambda w: w, fb("dist_token"))
        out["head_dist"] = {
            "kernel": get("head_dist.weight", _t, fb("head_dist", "kernel")),
            "bias": get("head_dist.bias", lambda w: w, fb("head_dist", "bias"))}

    def block(i):
        pre = f"blocks.{i}."
        return {
            "ln1": {"scale": sd[pre + "norm1.weight"],
                    "bias": sd[pre + "norm1.bias"]},
            "attn": {"qkv": {"kernel": _t(sd[pre + "attn.qkv.weight"]),
                             "bias": sd[pre + "attn.qkv.bias"]},
                     "proj": {"kernel": _t(sd[pre + "attn.proj.weight"]),
                              "bias": sd[pre + "attn.proj.bias"]}},
            "ln2": {"scale": sd[pre + "norm2.weight"],
                    "bias": sd[pre + "norm2.bias"]},
            "mlp": {"fc1": {"kernel": _t(sd[pre + "mlp.fc1.weight"]),
                            "bias": sd[pre + "mlp.fc1.bias"]},
                    "fc2": {"kernel": _t(sd[pre + "mlp.fc2.weight"]),
                            "bias": sd[pre + "mlp.fc2.bias"]}},
        }

    import jax
    blocks = [jax.tree.map(lambda a: jnp.asarray(a, dtype=cfg.param_dtype),
                           block(i)) for i in range(cfg.depth)]
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return out


def state_dict_from_pytree(params: dict, cfg: ViTCAMConfig
                           ) -> Dict[str, np.ndarray]:
    """Inverse mapping, for exporting checkpoints loadable by the reference."""
    p, c, d = cfg.patch_size, cfg.in_chans, cfg.embed_dim
    g = lambda a: np.asarray(a)
    sd = {
        "patch_embed.proj.weight":
            g(params["patch_embed"]["kernel"]).reshape(p, p, c, d)
            .transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": g(params["patch_embed"]["bias"]),
        "cls_token": g(params["cls_token"]),
        "pos_embed": g(params["pos_embed"]),
        "norm.weight": g(params["norm"]["scale"]),
        "norm.bias": g(params["norm"]["bias"]),
        "head.weight": _t(params["head"]["kernel"]),
        "head.bias": g(params["head"]["bias"]),
        "head1.weight": _t(params["head1"]["kernel"]),
        "head1.bias": g(params["head1"]["bias"]),
    }
    if cfg.has_logits:
        sd["pre_logits.fc.weight"] = _t(params["pre_logits"]["kernel"])
        sd["pre_logits.fc.bias"] = g(params["pre_logits"]["bias"])
    if cfg.distilled:
        # keep the round-trip with pytree_from_state_dict:101-105 closed
        # (these were loaded but never exported — review finding)
        sd["dist_token"] = g(params["dist_token"])
        sd["head_dist.weight"] = _t(params["head_dist"]["kernel"])
        sd["head_dist.bias"] = g(params["head_dist"]["bias"])
    for i in range(cfg.depth):
        import jax
        bp = jax.tree.map(lambda a: np.asarray(a[i]), params["blocks"])
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = bp["ln1"]["scale"]
        sd[pre + "norm1.bias"] = bp["ln1"]["bias"]
        sd[pre + "attn.qkv.weight"] = _t(bp["attn"]["qkv"]["kernel"])
        sd[pre + "attn.qkv.bias"] = bp["attn"]["qkv"]["bias"]
        sd[pre + "attn.proj.weight"] = _t(bp["attn"]["proj"]["kernel"])
        sd[pre + "attn.proj.bias"] = bp["attn"]["proj"]["bias"]
        sd[pre + "norm2.weight"] = bp["ln2"]["scale"]
        sd[pre + "norm2.bias"] = bp["ln2"]["bias"]
        sd[pre + "mlp.fc1.weight"] = _t(bp["mlp"]["fc1"]["kernel"])
        sd[pre + "mlp.fc1.bias"] = bp["mlp"]["fc1"]["bias"]
        sd[pre + "mlp.fc2.weight"] = _t(bp["mlp"]["fc2"]["kernel"])
        sd[pre + "mlp.fc2.bias"] = bp["mlp"]["fc2"]["bias"]
    return sd


def load_pth(path: str, cfg: ViTCAMConfig, params: Optional[dict] = None,
             del_keys: Sequence[str] = DEFAULT_DEL_KEYS) -> dict:
    """Load a .pth checkpoint (pretrained jx_ weights or reference fine-tuned)
    with the reference's head-key surgery (train_and_validate.py:111-119)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return pytree_from_state_dict(sd, cfg, params=params, del_keys=del_keys)


def load_weights(path: str, cfg: ViTCAMConfig, params: Optional[dict] = None,
                 del_keys: Sequence[str] = ()) -> dict:
    """Load model weights from ANY container the framework produces or
    consumes: a flat .npz (save_npz), a reference-format .pth (torch
    state_dict, with optional head-key surgery), or an orbax checkpoint
    DIRECTORY as written by cli.train — so validate/predict/export can point
    straight at `<ckpt_dir>/<tag>` without an .npz conversion step.  For a
    checkpoint directory the params subtree of the full train state is
    returned (optimizer moments and step are dropped).

    `params`/`del_keys` (the reference's head-key surgery,
    train_and_validate.py:111-119) apply to .pth ONLY: reference-format
    pretrained checkpoints can lack/mismatch the task heads, so those keys
    are dropped and backfilled from `params`.  orbax/.npz containers are
    this framework's own trees — written with the heads they trained — so
    they load verbatim."""
    if os.path.isdir(path):
        import jax
        import jax.numpy as jnp
        import orbax.checkpoint as ocp
        tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        tree = tree.get("params", tree)  # full train state vs bare params
        return jax.tree.map(jnp.asarray, tree)
    if path.endswith(".npz"):
        return load_npz(path)
    return load_pth(path, cfg, params=params, del_keys=del_keys)


def save_npz(path: str, params: dict) -> None:
    """Flat .npz export of the pytree (fast native format; orbax handles the
    full train state in train/checkpoint.py)."""
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, prefix + (k,))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec(params, ())
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    """Rebuild a nested pytree from save_npz output."""
    import jax.numpy as jnp
    data = np.load(path)
    out: dict = {}
    for k in data.files:
        node = out
        parts = [p for p in k.split("/") if p]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[k])
    return out

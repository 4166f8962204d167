"""Golden-test oracle: runs the PyTorch reference (read-only at
/root/reference) on CPU so our outputs can be pinned against it.

The reference hard-codes CUDA (vit_model.py:331,348,368) and loads
./palette.json at import time (vit_model.py:204-210); this harness
monkeypatches Tensor.cuda to a no-op and materializes a palette.json before
import.  No reference code is copied — it is imported and executed as a test
oracle only.
"""

from __future__ import annotations

import importlib
import os
import sys

import numpy as np

REFERENCE_DIR = "/root/reference"
_vit_module = None


def reference_vit_module():
    """Import /root/reference/vit_model.py once, CPU-patched."""
    global _vit_module
    if _vit_module is not None:
        return _vit_module

    import torch

    # vit_model.py asserts ./palette.json exists at import (vit_model.py:204)
    if not os.path.exists("./palette.json"):
        from vision_transformer_cam_tpu.data.palette import save_palette_json
        save_palette_json("./palette.json")

    # no-op CUDA so the hard-coded .cuda() calls run on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self

    # torchvision isn't installed here; vit_model.py imports it at module
    # scope (vit_model.py:15) but never uses it in the forward path — stub it.
    if "torchvision" not in sys.modules:
        import types
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms

    sys.path.insert(0, REFERENCE_DIR)
    _vit_module = importlib.import_module("vit_model")
    return _vit_module


def make_reference_model(num_classes=20, has_logits=False, *, double=False,
                         seed=0):
    """Instantiate the reference ViT-B/16-21k (the flagship factory,
    vit_model.py:462-476) with deterministic init."""
    import torch
    vm = reference_vit_module()
    torch.manual_seed(seed)
    model = vm.vit_base_patch16_224_in21k(num_classes=num_classes,
                                          has_logits=has_logits)
    model.eval()
    model.is_train = False
    if double:
        model = model.double()
    return model


def torch_state_dict_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def run_reference_pseudo_seg(head1_logits, head1_weight, top_embeds,
                             last_block_tokens, attn_weights, size,
                             cls_threshold=0.9, fg_cos=0.5, bg_thr=0.05):
    """Torch transliteration of validate.py:132-257 for ONE image, used only
    as a test oracle for our batched pipeline.

    head1_logits [C]; head1_weight [C,D]; top_embeds [K,D];
    last_block_tokens [N,D] (attn_matrix[11] row); attn_weights [L,H,N,N];
    size = (h, w) of the original image.
    Returns the uint8 pseudo-seg map [h, w].
    """
    import torch
    h, w = size
    head1_logits = torch.from_numpy(np.asarray(head1_logits))
    head1_weight = torch.from_numpy(np.asarray(head1_weight)).clone()
    top_embeds = torch.from_numpy(np.asarray(top_embeds))
    tokens = torch.from_numpy(np.asarray(last_block_tokens))
    attn = torch.from_numpy(np.asarray(attn_weights))
    k, d = top_embeds.shape
    c = head1_logits.shape[0]

    predcls = torch.sigmoid(head1_logits)
    predcls = (predcls >= cls_threshold).to(head1_weight.dtype)
    clsh1 = head1_weight.clone()
    for kk in range(c):
        if predcls[kk] == 0:
            clsh1[kk] = torch.full((d,), -10, dtype=clsh1.dtype)
    cls_to_feat = torch.argmax(clsh1, dim=0)                  # [D]
    filler = torch.arange(21, 21 + d * k, 1).reshape(d, k)
    contrib = torch.argmax(top_embeds, dim=0)                 # [D]
    for m in range(d):
        filler[m][contrib[m]] = cls_to_feat[m]
    patch_to_cls, _ = torch.mode(filler, dim=0)               # [K]

    pe = torch.nn.functional.normalize(tokens[1:, :], dim=1)  # [P, D]
    he = torch.nn.functional.normalize(top_embeds, dim=1)     # [K, D]
    g = int(round((tokens.shape[0] - 1) ** 0.5))
    maps = []
    for i in range(k):
        cos = (he[i].unsqueeze(0) @ pe.t()).reshape(g, g)
        up = torch.nn.functional.interpolate(
            cos[None, None], size=(h, w), mode="bilinear",
            align_corners=False)[0, 0]
        maps.append(up)
    stack = torch.stack(maps)
    final_seg = stack.argmax(dim=0)
    final_v, _ = stack.max(dim=0)
    final_v = (final_v >= fg_cos).to(stack.dtype)

    final_seg = final_seg + 50
    for i in range(k):
        final_seg[final_seg == 50 + i] = patch_to_cls[i] + 1

    att = attn[5:].mean(dim=0).mean(dim=0)                    # [N, N]
    aug = att + torch.eye(att.shape[0], dtype=att.dtype)
    aug = aug / aug.sum(dim=-1, keepdim=True)
    row = aug[0, 1:]
    row = row / row.max()
    bg = torch.nn.functional.interpolate(
        row.reshape(g, g)[None, None], size=(h, w), mode="bilinear",
        align_corners=False)[0, 0]
    bg = (bg >= bg_thr).to(stack.dtype)

    res = final_seg.to(stack.dtype) * final_v * bg
    return res.to(torch.uint8).numpy()


def run_reference(model, images_nchw: np.ndarray):
    """Forward the reference model; returns the 6-tuple as numpy
    (vit_model.py:424)."""
    import torch
    x = torch.from_numpy(images_nchw)
    if next(model.parameters()).dtype == torch.float64:
        x = x.double()
    with torch.no_grad():
        out, attn_w, attn_m, allbs, clsh1_w, ori_allbs = model(x)
    return {
        "logits": out.numpy(),
        "attn_weights": np.stack([a.numpy() for a in attn_w]),   # [L,B,H,N,N]
        "attn_matrix": np.stack([a.numpy() for a in attn_m]),    # [L,B,N,C]
        "head1_logits": allbs.numpy(),
        "head1_weight": clsh1_w.numpy(),                          # [nc, C]
        "top_patch_embeds": ori_allbs.numpy(),                    # [B,K,C]
    }

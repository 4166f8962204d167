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

"""Checkpoint / resume.

The reference saves bare weights only — best-train-loss and final-epoch
state_dicts via torch.save (train_and_validate.py:189-195) — so "resume" means
re-finetuning.  Here a checkpoint is the FULL train state (params, optimizer
moments, step) via orbax, so training resumes exactly; plus .pth import/export
shims for interop with reference-format weights (io/weights.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from vision_transformer_cam_tpu.train.state import TrainState

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save(ckpt_dir: str, tag: str, state: TrainState) -> str:
    """Save full train state under <ckpt_dir>/<tag>.

    Orbax consumes the jax arrays directly (it understands shardings and
    gathers across hosts); the npz fallback gathers to host numpy, which
    only works single-host."""
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, {"step": state.step, "params": state.params,
                          "opt_state": state.opt_state}, force=True)
        return path
    # flat-npz fallback (single-host: gathers to host numpy)
    state = jax.tree.map(np.asarray, state)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat, treedef = jax.tree.flatten(state)
    np.savez(path + ".npz", treedef=np.frombuffer(
        str(treedef).encode(), dtype=np.uint8),
        **{f"leaf{i}": l for i, l in enumerate(flat)})
    return path


def restore(ckpt_dir: str, tag: str, template: TrainState) -> TrainState:
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        # Restore directly onto the template's shardings/dtypes (required
        # for multi-host; avoids orbax's sharding-from-file fallback).
        item = {"step": template.step, "params": template.params,
                "opt_state": template.opt_state}
        try:
            restore_args = ocp.checkpoint_utils.construct_restore_args(item)
            tree = ckptr.restore(path, item=item, restore_args=restore_args)
        except Exception:
            tree = ckptr.restore(path)
        return TrainState(step=tree["step"], params=tree["params"],
                          opt_state=jax.tree.unflatten(
                              jax.tree.structure(template.opt_state),
                              jax.tree.leaves(tree["opt_state"])))
    flat, treedef = jax.tree.flatten(template)
    with np.load(path + ".npz") as z:
        leaves = [z[f"leaf{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves)


def latest_tag(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    tags = [t for t in os.listdir(ckpt_dir)
            if os.path.isdir(os.path.join(ckpt_dir, t)) or t.endswith(".npz")]
    if not tags:
        return None
    # newest by mtime, NOT lexicographically: within one run the tag
    # '...-cur_ep9-...' sorts after '...-cur_ep15-...' as a string, so a
    # string max() could resume an older checkpoint (advisor finding).
    newest = max(tags,
                 key=lambda t: os.path.getmtime(os.path.join(ckpt_dir, t)))
    return newest.removesuffix(".npz")

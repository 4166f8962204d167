"""Device mesh + sharding layout for the TPU-native ViT-CAM framework.

Replaces the reference's NCCL DDP stack (distributed_utils.py:7-70, DDP wrap at
train_and_validate.py:142-146) with the SPMD design: one `jax.sharding.Mesh`,
`NamedSharding` annotations on the train step's inputs, and XLA-inserted
collectives over ICI.  By construction this fixes the reference's
rank-0-only-DDP bug (train_and_validate.py:142-146) — in SPMD there is no way
to "forget" to synchronize replicas.

Axes:
  data   — batch sharding (the reference's only strategy: DistributedSampler +
           DDP gradient all-reduce).
  model  — optional tensor parallelism over attention heads and the MLP hidden
           dimension, for the ViT-L/H zoo configs (SURVEY.md §2.3).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init() -> None:
    """Multi-host DCN rendezvous (the SPMD analog of the reference's
    dist.init_process_group at train_and_validate.py:36).  No-op unless the
    standard cluster env (JAX_COORDINATOR_ADDRESS / SLURM / TPU pod metadata)
    is present, so single-host runs need no flags — unlike the reference,
    which required torchrun even on one GPU."""
    if jax.process_count() > 1:
        return  # already initialized
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(shape: Tuple[int, ...] = (-1,),
              axes: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh; one `-1` wildcard absorbs the remaining device count."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    if n != len(devices):
        devices = devices[:n]
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding — per-host/per-chip data parallelism,
    replacing DistributedSampler (train_and_validate.py:87-88)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspecs(params, model_axis: Optional[str] = None):
    """PartitionSpec pytree for the model parameters.

    With no model axis everything is replicated (pure data parallelism — the
    reference's semantics).  With a model axis, tensor-parallel layout over
    heads / MLP hidden dim:

      blocks.attn.qkv.kernel  [L, D, 3D]   shard 3D   (per-head QKV shards)
      blocks.attn.qkv.bias    [L, 3D]      shard 3D
      blocks.attn.proj.kernel [L, D, D]    shard in-D (row parallel)
      blocks.mlp.fc1.kernel   [L, D, H]    shard H    (column parallel)
      blocks.mlp.fc1.bias     [L, H]       shard H
      blocks.mlp.fc2.kernel   [L, H, D]    shard H    (row parallel)

    XLA/GSPMD inserts the reduce-scatter/all-reduce pair after proj/fc2.
    """
    def spec_for(path, leaf):
        if model_axis is None:
            return P()
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "blocks" in keys:
            if "qkv" in keys:
                return P(None, None, model_axis) if leaf.ndim == 3 \
                    else P(None, model_axis)
            if "proj" in keys and leaf.ndim == 3:
                return P(None, model_axis, None)
            if "fc1" in keys:
                return P(None, None, model_axis) if leaf.ndim == 3 \
                    else P(None, model_axis)
            if "fc2" in keys and leaf.ndim == 3:
                return P(None, model_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(mesh: Mesh, params, model_axis: Optional[str] = None):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_pspecs(params, model_axis))


def shard_params(mesh: Mesh, params, model_axis: Optional[str] = None):
    """Place a (host or single-device) param pytree onto the mesh."""
    return jax.device_put(params, param_shardings(mesh, params, model_axis))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


# --- distributed_utils.py:31-70 API parity (SPMD semantics) -----------------

def get_world_size() -> int:
    """distributed_utils.py:37-40 — device count across all hosts."""
    return jax.device_count()


def get_rank() -> int:
    """distributed_utils.py:43-46 — process index (host rank; per-device
    ranks don't exist in SPMD)."""
    return jax.process_index()


def is_main_process() -> bool:
    """distributed_utils.py:49-50."""
    return jax.process_index() == 0


def reduce_value(value, average: bool = True, axis_name: str = "data"):
    """distributed_utils.py:60-70 — all-reduce inside a pmap/shard_map body.
    Under pjit/GSPMD this is never needed explicitly (sharding propagation
    inserts the collective); provided for hand-rolled shard_map code."""
    return jax.lax.pmean(value, axis_name) if average \
        else jax.lax.psum(value, axis_name)


def process_local_slice(n: int, batch_size: int):
    """[start, stop) of the global index range this process loads — the
    per-host sharded replacement for DistributedSampler rank slicing."""
    pi, pc = jax.process_index(), jax.process_count()
    per = batch_size // pc
    return pi * per, (pi + 1) * per if pi != pc - 1 else batch_size

"""SPMD parallelism: mesh construction, sharding layouts, multi-host init,
and the pipeline-parallel runner (parallel/pipeline.py; sequence
parallelism lives in the model as GSPMD constraints — cfg.seq_axis).

Replaces the reference's NCCL/DDP communication layer
(distributed_utils.py, train_and_validate.py:36,142-146) and extends it
with the strategies DDP cannot express: tensor (dp x tp), sequence
(dp x sp) and pipeline (dp x pp) sharding.
"""

from vision_transformer_cam_tpu.parallel.mesh import (  # noqa: F401
    apply_seq_parallel, data_sharding, distributed_init, get_rank,
    get_world_size, is_main_process, make_mesh, param_pspecs,
    param_shardings, process_local_slice, reduce_value, replicated,
    seq_parallel_mesh, shard_batch, shard_params)

"""Pallas TPU kernels: fused masked attention (fwd + bwd), whole-sub-block
fusion variant."""

from vision_transformer_cam_tpu.kernels.attention import (  # noqa: F401
    attention_block_fused, attention_pallas, fused_attention_diff,
    masked_attention, masked_attention_bwd, masked_attention_fused)

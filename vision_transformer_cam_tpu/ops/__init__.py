from vision_transformer_cam_tpu.ops import (  # noqa: F401
    interpolate, losses, quant, rollout)

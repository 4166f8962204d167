from vision_transformer_cam_tpu.ops import interpolate, losses, rollout

from vision_transformer_cam_tpu.models.vit import (ViTCAMOutput, apply,
                                                   forward_features, init,
                                                   patch_embed)

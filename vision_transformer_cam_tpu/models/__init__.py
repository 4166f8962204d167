from vision_transformer_cam_tpu.models import (  # noqa: F401
    densenet, resnet, squeezenet)
from vision_transformer_cam_tpu.models.vit import (  # noqa: F401
    ViTCAMOutput, apply, forward, forward_features, init, patch_embed)

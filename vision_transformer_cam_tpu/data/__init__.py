from vision_transformer_cam_tpu.data import (  # noqa: F401
    generic, loader, palette, transforms, voc12)

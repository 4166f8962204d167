from vision_transformer_cam_tpu.data import loader, palette, transforms, voc12

from vision_transformer_cam_tpu.io import native_loader, weights  # noqa: F401,E402

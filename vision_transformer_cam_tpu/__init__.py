"""vision_transformer_cam_tpu: TPU-native (JAX/XLA/Pallas/pjit) framework with
the capabilities of Jingfeng-Tang/vision_transformer_cam — ViT fine-tuning for
multi-label classification on VOC12, attention-rollout CAM extraction, and
weakly-supervised pseudo-segmentation."""

__version__ = "0.1.0"

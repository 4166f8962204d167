"""Command-line entries mirroring the reference's scripts:

  python -m vision_transformer_cam_tpu.cli.train     (train_and_validate.py)
  python -m vision_transformer_cam_tpu.cli.validate  (validate.py)
  python -m vision_transformer_cam_tpu.cli.predict   (predict.py)
  python -m vision_transformer_cam_tpu.cli.tools     (make_cls_labels /
                                                      get_palette / flops)
  python -m vision_transformer_cam_tpu.cli.export    (StableHLO serving
                                                      artifact — no
                                                      reference equivalent)
"""

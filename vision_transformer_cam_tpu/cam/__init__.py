"""CAM / pseudo-segmentation subsystem.

Rebuilds the reference's weakly-supervised-segmentation outputs TPU-first:
  * pseudo_seg — validate.py:123-262's per-image pipeline, batched and jitted
    up to the resolution-independent math, numpy for per-image upsampling;
  * render — utils.py:80-129 CAM heatmap overlays without cv2.
"""

from vision_transformer_cam_tpu.cam.pseudo_seg import (  # noqa: F401
    PseudoSegDeviceOut, compose_pseudo_seg, pseudo_seg_batch,
    pseudo_seg_device)
from vision_transformer_cam_tpu.cam.render import (  # noqa: F401
    cam_norm, jet_colormap, overlay_cam, render_origin_cams)

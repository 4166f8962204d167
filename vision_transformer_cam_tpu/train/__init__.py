"""Training stack: optax optimizer + timm-parity schedule, sharded train/eval
steps, full-state checkpointing, epoch orchestration.

Rebuilds train_and_validate.py:34-195 and utils.py:144-245 TPU-first.
"""

from vision_transformer_cam_tpu.train.schedule import (  # noqa: F401
    scaled_base_lr, timm_cosine_schedule)
from vision_transformer_cam_tpu.train.state import (  # noqa: F401
    TrainState, create_train_state, make_optimizer, trainable_mask)
from vision_transformer_cam_tpu.train.step import (  # noqa: F401
    eval_step, f1_micro, topk_by_label_count, train_step)

#!/usr/bin/env bash
# TPU-native equivalent of the reference's run_train_and_validate.sh:1-19.
# The reference launches per-GPU processes via torchrun; here one process
# drives the whole chip/mesh (SPMD), and multi-host pods launch this same
# script on every host (jax.distributed discovers peers from the environment).
set -euo pipefail

VOC12_ROOT=${VOC12_ROOT:-/data/VOC2012}
SPLITS=${SPLITS:-./voc12}
WEIGHTS=${WEIGHTS:-}     # pretrained .pth/.npz; empty = random init

python -m vision_transformer_cam_tpu.cli.train \
  --model_name vit_base_patch16_224_in21k \
  --num_classes 20 \
  --epochs 1000 \
  --batch_size 32 \
  --lr 5e-4 \
  --dataset_path "${VOC12_ROOT}" \
  --train_img_name_path "${SPLITS}/train_aug.txt" \
  --val_img_name_path "${SPLITS}/val.txt" \
  --cls_labels_path "${SPLITS}/cls_labels.npy" \
  ${WEIGHTS:+--weights "${WEIGHTS}"} \
  "$@"

python -m vision_transformer_cam_tpu.cli.validate \
  --dataset_path "${VOC12_ROOT}" \
  --val_img_name_path "${SPLITS}/val.txt" \
  --cls_labels_path "${SPLITS}/cls_labels.npy" \
  --batch_size 64

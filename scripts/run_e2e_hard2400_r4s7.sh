#!/bin/bash
# Session-7 rerun of the e2e joint tri-modal on the hard-2400 corpus — the
# run the session-6 host-OOM kill truncated at epoch 24/30. Now uses the
# transfer-free config built as the fix: TRAIN.DEVICE_DATA (train split in
# HBM, on-device index gather) + TRAIN.DEVICE_EVAL (val/test resident too),
# so the relay client's per-transfer host-RAM leak has nothing to leak on.
# Corpus cache pre-built on CPU (runs/e2e_hard2400/cache) before launch.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r4s7

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 TRAIN.USE_CHECKPOINT True"

timeout 21600 python -m mvuld_tpu.train.train_e2e \
  --synthetic 2400 --hard --batch-size 16 --output runs/e2e_hard2400 \
  --opts $SWIN_OPTS TRAIN.EPOCHS 30 $COMMON \
        TRAIN.BEST_SAVE params SAVE_FREQ 4 TRAIN.BEST_FETCH async \
        TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True \
  > runs/r4s7/e2e_hard2400.log 2>&1
echo "E2E_HARD2400_DONE rc=$?"

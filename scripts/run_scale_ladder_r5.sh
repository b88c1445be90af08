#!/bin/bash
# Round-5 task #8: hard-corpus scale ladder at 4800 functions — separates
# "architecture can't express the relation" from "not enough data".
# Same protocol as hard-600/hard-2400 (seed-42 corpus/split, 30-epoch
# budget, reference dims). IVDetect (the strongest baseline) vs the
# e2e tri-modal with the dependency-context channel.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r5

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 TRAIN.USE_CHECKPOINT True"

timeout 10800 python -m mvuld_tpu.train.train_baseline --model ivdetect \
  --synthetic 4800 --hard --epochs 30 --max-nodes 100 --emb-dim 100 \
  --out-dir runs/hard4800_ivdetect > runs/r5/hard4800_ivdetect.log 2>&1
echo "IVDETECT4800_DONE rc=$?"

# token probe control at this scale
timeout 1800 python -m mvuld_tpu.tools.hardprobe --sizes 4800 \
  > runs/r5/hardprobe_4800.log 2>&1 || true

timeout 28800 python -m mvuld_tpu.train.train_e2e \
  --synthetic 4800 --hard --batch-size 16 --output runs/e2e_hard4800_ctx \
  --opts $SWIN_OPTS TRAIN.EPOCHS 30 $COMMON \
        DATA.NODE_CONTEXT deps \
        TRAIN.BEST_SAVE params SAVE_FREQ 4 TRAIN.BEST_FETCH async \
        TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True \
  > runs/r5/e2e_hard4800_ctx.log 2>&1
echo "E2E4800_DONE rc=$?"

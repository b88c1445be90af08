#!/bin/bash
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 TRAIN.USE_CHECKPOINT True"

# finish the E1 (deps-context) A/B: resume from ckpt_epoch_16
timeout 7200 python -m mvuld_tpu.train.train_e2e \
  --synthetic 2400 --hard --batch-size 16 --output runs/e2e_hard2400_ctx \
  --opts $SWIN_OPTS TRAIN.EPOCHS 30 $COMMON \
        DATA.NODE_CONTEXT deps TRAIN.AUTO_RESUME True \
        TRAIN.BEST_SAVE params SAVE_FREQ 4 TRAIN.BEST_FETCH async \
        TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True \
  > runs/r5/e2e_hard2400_ctx_resume.log 2>&1
echo "E1_RESUME_DONE rc=$?"

bash scripts/run_endgame_r5.sh > runs/r5/endgame.log 2>&1
echo "ALL_DONE"

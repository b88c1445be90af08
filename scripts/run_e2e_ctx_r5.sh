#!/bin/bash
# Round-5 task #1 experiment: e2e joint tri-modal on hard-2400 with the
# dependency-context node channel (DATA.NODE_CONTEXT=deps) — identical
# corpus/split/budget/protocol to the r4 baseline run (runs/e2e_hard2400,
# TEST F1 0.626 / ROC 0.578) so the A/B isolates the feature change.
# Rendered PNGs/positions are hard-linked from the r4 cache; the npz cache
# rebuilds (node_context key mismatch) reusing them.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r5

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 TRAIN.USE_CHECKPOINT True"

timeout 21600 python -m mvuld_tpu.train.train_e2e \
  --synthetic 2400 --hard --batch-size 16 --output runs/e2e_hard2400_ctx \
  --opts $SWIN_OPTS TRAIN.EPOCHS 30 $COMMON \
        DATA.NODE_CONTEXT deps \
        TRAIN.BEST_SAVE params SAVE_FREQ 4 TRAIN.BEST_FETCH async \
        TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True \
  > runs/r5/e2e_hard2400_ctx.log 2>&1
echo "E2E_CTX_DONE rc=$?"

# 30-epoch text-only (cUniXcoder) on the same corpus — fills the missing
# table cell and probes whether the whole-function transformer channel can
# learn the value-binding relation at all (skipped if already trained)
if [ ! -f runs/text_hard2400/swinv2_base_patch4_window24to28/default/history.json ]; then
  timeout 7200 python -m mvuld_tpu.train.train_text \
    --synthetic 2400 --hard --batch-size 16 --output runs/text_hard2400 \
    --opts TRAIN.EPOCHS 30 $COMMON \
    > runs/r5/text_hard2400.log 2>&1
  echo "TEXT_HARD2400_DONE rc=$?"
fi

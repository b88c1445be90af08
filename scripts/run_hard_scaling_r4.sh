#!/bin/bash
# Round-4 session-6: 4x data-scaling run on the HARD (value-binding) corpus.
# NOTES_r4 session 5 measured every architecture at ~chance on hard-600
# (480 train functions); this asks whether the literal-relation becomes
# learnable at 2400 functions (1920 train) under the SAME 30-epoch budget.
# Corpus: tools/synthetic.py hard mode, seed 42, stratified split 80/10/10.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r4s6

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 TRAIN.USE_CHECKPOINT True"

# ---- graph baselines at 4x (same dims as the hard-600 table:
#      100 nodes, w2v/GloVe-100, 30 epochs)
for m in devign reveal ivdetect; do
  timeout 7200 python -m mvuld_tpu.train.train_baseline --model "$m" \
    --synthetic 2400 --hard --epochs 30 --max-nodes 100 --emb-dim 100 \
    --out-dir "runs/hard2400_$m" > "runs/r4s6/hard2400_$m.log" 2>&1
done

# ---- end-to-end joint tri-modal at 4x, same budget (cache pre-built on
#      CPU via --cache-only while the chip was warming)
timeout 21600 python -m mvuld_tpu.train.train_e2e \
  --synthetic 2400 --hard --batch-size 16 --output runs/e2e_hard2400 \
  --opts $SWIN_OPTS TRAIN.EPOCHS 30 $COMMON \
        TRAIN.BEST_SAVE params SAVE_FREQ 4 TRAIN.BEST_FETCH async \
  > runs/r4s6/e2e_hard2400.log 2>&1

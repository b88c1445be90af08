#!/bin/bash
# Round-4 production-dims system run (VERDICT r3 tasks 4+5):
#   SwinV2-Base-448 fine-tune -> render -> EAST OCR positions -> caches ->
#   fusion (tri-modal + ablations) + matched-budget end-to-end joint run.
# Corpus: 600 synthetic functions, seed 42 (shared split across all runs).
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 TRAIN.USE_CHECKPOINT True"

# ---- main tri-modal pipeline (OCR positions from the r4 EAST model)
timeout 14400 python -m mvuld_tpu.train.pipeline \
  --synthetic 600 --out runs/pipeline_r4 --batch-size 16 \
  --text-epochs 6 --swin-epochs 3 --fusion-epochs 30 \
  --east-ckpt runs/east_r4b --arch multi_defect_new_gcn \
  --opts $SWIN_OPTS $COMMON

# ---- ablations: retrain fusion only, same OCR-positioned caches
test -f runs/pipeline_r4/cache_ocr/train.npz || exit 1
for arch in multi_defect_nograph multi_defect_noglobalimage multi_defect_nofunc; do
  timeout 3600 python -m mvuld_tpu.train.train_fusion \
    --cache-dir runs/pipeline_r4/cache_ocr --batch-size 16 \
    --output runs/pipeline_r4/fusion_$arch --arch $arch \
    --opts MODEL.MULTI.TEXT_DIM 768 MODEL.MULTI.IMG_DIM 1024 \
           TRAIN.EPOCHS 30 $COMMON
done

# ---- staged-vs-joint: end-to-end trainer, same corpus/seed/split,
#      same fusion budget (30 epochs) with encoders trained jointly
timeout 10800 python -m mvuld_tpu.train.train_e2e \
  --synthetic 600 --batch-size 16 --output runs/e2e_r4 \
  --opts $SWIN_OPTS TRAIN.EPOCHS 30 $COMMON

# ---- durable evidence: runs/ is gitignored and the workspace can be
#      reset between sessions, so copy the small summary/metric files
#      (no checkpoints) into the committed artifacts tree
bash scripts/capture_artifacts_r4.sh || true

#!/bin/bash
# Session-7 rerun of the STAGED tri-modal pipeline on hard-2400 (the
# session-6 attempt lost its runs/ state to a workspace reset before the
# fusion stages finished). Identical protocol to run_hard_staged_r4.sh,
# plus TRAIN.DEVICE_DATA/DEVICE_EVAL on every stage that supports them
# (fusion) so the relay-client transfer leak has nothing to leak on.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r4s7

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 \
TRAIN.USE_CHECKPOINT True TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True"

# ---- stage 0: EAST detector, domain-randomized (east_r4b recipe)
if [ ! -d runs/east_r5 ]; then
  timeout 7200 python -m mvuld_tpu.train.train_east \
    --synthetic 1000 --epochs 30 --train-style random \
    --eval-synthetic 200 --eval-style heldout --out-dir runs/east_r5 \
    > runs/r4s7/east_r5.log 2>&1 || exit 1
fi

# ---- stage 1: staged tri-modal pipeline, OCR positions in the loop
timeout 14400 python -m mvuld_tpu.train.pipeline \
  --synthetic 2400 --hard --out runs/pipeline_hard2400 --batch-size 16 \
  --text-epochs 6 --swin-epochs 3 --fusion-epochs 30 \
  --east-ckpt runs/east_r5 --arch multi_defect_new_gcn \
  --opts $SWIN_OPTS $COMMON \
  > runs/r4s7/pipeline_hard2400.log 2>&1

# ---- stage 2: ablations over the same OCR-positioned caches (cheap)
test -f runs/pipeline_hard2400/cache_ocr/train.npz || exit 1
for arch in multi_defect_nograph multi_defect_nofunc; do
  timeout 3600 python -m mvuld_tpu.train.train_fusion \
    --cache-dir runs/pipeline_hard2400/cache_ocr --batch-size 16 \
    --output runs/pipeline_hard2400/fusion_$arch --arch $arch \
    --opts MODEL.MULTI.TEXT_DIM 768 MODEL.MULTI.IMG_DIM 1024 \
           TRAIN.EPOCHS 30 $COMMON \
    > "runs/r4s7/hard2400_fusion_$arch.log" 2>&1
done
echo "HARD_STAGED_DONE"

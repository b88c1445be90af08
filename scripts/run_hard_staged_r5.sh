#!/bin/bash
# Round-5 completion of the staged hard-2400 chain. The single-process
# pipeline was host-OOM-killed TWICE by the relay client's per-transfer
# RAM leak (130 GB anon-RSS; memory rule 8) — this restart minimizes the
# leak budget per process: the trained swin encoder is LOADED
# (--swin-ckpt, no retrain), the text stage resumes via its best-f1
# checkpoints, OCR pickles + test.npz are reused from disk, so the fresh
# process only pays the train/val cache encode passes + fusion.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r5

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 \
TRAIN.USE_CHECKPOINT True TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True"

timeout 14400 python -m mvuld_tpu.train.pipeline \
  --synthetic 2400 --hard --out runs/pipeline_hard2400 --batch-size 16 \
  --text-epochs 6 --swin-epochs 0 \
  --swin-ckpt runs/pipeline_hard2400/swin \
  --fusion-epochs 30 \
  --east-ckpt runs/east_r5 --arch multi_defect_new_gcn \
  --opts $SWIN_OPTS $COMMON \
  > runs/r5/pipeline_hard2400_resume.log 2>&1 || exit 1

test -f runs/pipeline_hard2400/cache_ocr/train.npz || exit 1
for arch in multi_defect_nograph multi_defect_nofunc; do
  timeout 3600 python -m mvuld_tpu.train.train_fusion \
    --cache-dir runs/pipeline_hard2400/cache_ocr --batch-size 16 \
    --output runs/pipeline_hard2400/fusion_$arch --arch $arch \
    --opts MODEL.MULTI.TEXT_DIM 768 MODEL.MULTI.IMG_DIM 1024 \
           TRAIN.EPOCHS 30 $COMMON \
    > "runs/r5/hard2400_fusion_$arch.log" 2>&1
done
echo "HARD_STAGED_DONE"

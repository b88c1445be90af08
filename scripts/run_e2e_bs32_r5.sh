#!/bin/bash
# Round-5 task #5: e2e bs32 under the new memory regime (DEVICE_DATA landed
# after the r4s3 bs32-OOM rejection). Throughput probe only: 2 epochs on the
# hard-2400 corpus, stage-2-only swin remat, capacity 1024; TEXT_REMAT
# escalation if the first config OOMs. Records fn/s either way.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r5

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 PRINT_FREQ 10 TRAIN.USE_CHECKPOINT True \
TRAIN.REMAT_STAGES [2] TRAIN.TEXT_REMAT off \
TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True SAVE_FREQ 0"

try () {  # $1 = tag, rest = extra opts
  local tag=$1; shift
  timeout 7200 python -m mvuld_tpu.train.train_e2e \
    --synthetic 2400 --hard --batch-size 32 --node-capacity 1024 \
    --output runs/e2e_bs32_probe \
    --opts $SWIN_OPTS TRAIN.EPOCHS 2 $COMMON "$@" \
    > "runs/r5/e2e_bs32_$tag.log" 2>&1
  local rc=$?
  echo "BS32_${tag}_rc=$rc"
  return $rc
}

rm -rf runs/e2e_bs32_probe
# seed the render/pos caches from the r4 run (same corpus) to skip ~20 min
# of host-side re-rendering; the npz itself rebuilds for this dir
SEED_CACHE=runs/e2e_hard2400/swinv2_base_patch4_window24to28/default/cache
NEW_CACHE=runs/e2e_bs32_probe/swinv2_base_patch4_window24to28/default/cache
if [ -d "$SEED_CACHE/imgs" ]; then
  mkdir -p "$NEW_CACHE"
  cp -al "$SEED_CACHE/imgs" "$NEW_CACHE/imgs"
  cp -al "$SEED_CACHE/pos" "$NEW_CACHE/pos"
  cp "$SEED_CACHE/e2e.npz" "$NEW_CACHE/e2e.npz" 2>/dev/null || true
fi

try rs2_troff && exit 0
# escalate remat if OOM
rm -rf runs/e2e_bs32_probe/swinv2_base_patch4_window24to28/default/checkpoints
try rs2_tron TRAIN.TEXT_REMAT on && exit 0
try all_tron TRAIN.REMAT_STAGES [] TRAIN.TEXT_REMAT on

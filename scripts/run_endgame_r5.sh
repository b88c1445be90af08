#!/bin/bash
# Round-5 endgame queue (run after the e2e-ctx A/B frees the chip):
#   1. devign + reveal hard-2400 retrains w/ checkpoint persistence (fast)
#   2. E2 experiment: e2e + dependency-context + numeric value channel
#      (cold compile ~20-40 min; ivdetect trains during the compile window)
#   3. ivdetect hard-2400 retrain
#   4. patch-eval flip-rate table over every trained detector
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r5 artifacts/r5

SWIN_OPTS="MODEL.SWINV2.EMBED_DIM 128 MODEL.SWINV2.DEPTHS [2,2,18,2] \
MODEL.SWINV2.NUM_HEADS [4,8,16,32] MODEL.SWINV2.WINDOW_SIZE 28 \
MODEL.SWINV2.PRETRAINED_WINDOW_SIZES [12,12,12,6] DATA.IMG_SIZE 448"
COMMON="TRAIN.WARMUP_EPOCHS 1 TRAIN.EARLY_STOP_PATIENCE 50 PRINT_FREQ 50 TRAIN.USE_CHECKPOINT True"

# ---- 1: fast graph baselines (chip alone)
for m in devign reveal; do
  if [ ! -f "runs/hard2400_$m/baseline_ckpt.pkl" ]; then
    timeout 3600 python -m mvuld_tpu.train.train_baseline --model "$m" \
      --synthetic 2400 --hard --epochs 30 --max-nodes 100 --emb-dim 100 \
      --out-dir "runs/hard2400_$m" > "runs/r5/hard2400_$m.log" 2>&1
  fi
done

# ---- 2: E2 (ctx + numeric) — corpus upload + compile submit; training
#      begins when the remote compile returns
timeout 14400 python -m mvuld_tpu.train.train_e2e \
  --synthetic 2400 --hard --batch-size 16 --output runs/e2e_hard2400_ctxnum \
  --opts $SWIN_OPTS TRAIN.EPOCHS 30 $COMMON \
        DATA.NODE_CONTEXT deps DATA.NODE_NUMERIC 2 \
        TRAIN.BEST_SAVE params SAVE_FREQ 4 TRAIN.BEST_FETCH async \
        TRAIN.DEVICE_DATA True TRAIN.DEVICE_EVAL True \
  > runs/r5/e2e_hard2400_ctxnum.log 2>&1 &
E2_PID=$!

# ---- 3: ivdetect during E2's compile window
if [ ! -f runs/hard2400_ivdetect/baseline_ckpt.pkl ]; then
  timeout 5400 python -m mvuld_tpu.train.train_baseline --model ivdetect \
    --synthetic 2400 --hard --epochs 30 --max-nodes 100 --emb-dim 100 \
    --out-dir runs/hard2400_ivdetect > runs/r5/hard2400_ivdetect.log 2>&1
fi

# ---- 4: patch-evals for the detectors whose checkpoints exist
for m in devign reveal ivdetect; do
  [ -f "runs/hard2400_$m/baseline_ckpt.pkl" ] || continue
  timeout 3600 python -m mvuld_tpu.tools.eval_patches --model "$m" \
    --ckpt "runs/hard2400_$m" --synthetic 200 --hard --seed 7 \
    --batch-size 16 --out "runs/patch_eval/$m" \
    > "runs/r5/patch_eval_$m.log" 2>&1
done
timeout 3600 python -m mvuld_tpu.tools.eval_patches --model text \
  --ckpt runs/text_hard2400 --synthetic 200 --hard --seed 7 \
  --batch-size 16 --out runs/patch_eval/text \
  > runs/r5/patch_eval_text.log 2>&1

wait $E2_PID
echo "E2_DONE rc=$?"

# tri-modal patch eval on the best available e2e run (ctxnum > ctx > r4)
for d in runs/e2e_hard2400_ctxnum runs/e2e_hard2400_ctx runs/e2e_hard2400; do
  if find "$d" -name "best_f1_epoch_*" 2>/dev/null | grep -q .; then E2E=$d; break; fi
done
timeout 7200 python -m mvuld_tpu.tools.eval_patches --model e2e \
  --ckpt "$E2E" --synthetic 120 --hard --seed 7 \
  --batch-size 16 --out runs/patch_eval/e2e \
  > runs/r5/patch_eval_e2e.log 2>&1

python - <<'PY'
import json, os
table = {}
for m in ("devign", "reveal", "ivdetect", "text", "e2e"):
    p = f"runs/patch_eval/{m}/patch_eval.json"
    if os.path.exists(p):
        table[m] = json.load(open(p))
os.makedirs("artifacts/r5", exist_ok=True)
json.dump(table, open("artifacts/r5/patch_eval.json", "w"), indent=2)
print("patch-eval table written:", list(table))
PY
echo "ENDGAME_DONE"

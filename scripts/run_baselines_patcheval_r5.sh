#!/bin/bash
# Round-5 tasks #2/#3: retrain the three graph baselines on hard-2400 with
# checkpoint persistence (baseline_ckpt.pkl is new in r5), then run the
# eval_patches parity driver over every trained detector — the flip-rate
# table + t-SNE artifacts the reference produces with
# baselines/scripts/eval_patches.py:38-615.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p runs/r5 artifacts/r5

# same protocol as the r4 hard-2400 table (seed-42 corpus/split, 30 epochs,
# reference dims: 100 nodes, emb-100)
for m in devign reveal ivdetect; do
  if [ ! -f "runs/hard2400_$m/baseline_ckpt.pkl" ]; then
    timeout 7200 python -m mvuld_tpu.train.train_baseline --model "$m" \
      --synthetic 2400 --hard --epochs 30 --max-nodes 100 --emb-dim 100 \
      --out-dir "runs/hard2400_$m" > "runs/r5/hard2400_$m.log" 2>&1
  fi
done

# patch eval: 200 hard twins (unseen parameterizations, seed 7) per detector
for m in devign reveal ivdetect; do
  timeout 3600 python -m mvuld_tpu.tools.eval_patches --model "$m" \
    --ckpt "runs/hard2400_$m" --synthetic 200 --hard --seed 7 \
    --batch-size 16 --out "runs/patch_eval/$m" \
    > "runs/r5/patch_eval_$m.log" 2>&1
done

# text detector (30-epoch run from run_e2e_ctx_r5.sh)
if [ -d runs/text_hard2400 ]; then
  timeout 3600 python -m mvuld_tpu.tools.eval_patches --model text \
    --ckpt runs/text_hard2400 --synthetic 200 --hard --seed 7 \
    --batch-size 16 --out runs/patch_eval/text \
    > runs/r5/patch_eval_text.log 2>&1
fi

# tri-modal e2e (prefer the ctx run, fall back to the r4 baseline run)
E2E=runs/e2e_hard2400_ctx
[ -d "$E2E" ] || E2E=runs/e2e_hard2400
timeout 7200 python -m mvuld_tpu.tools.eval_patches --model e2e \
  --ckpt "$E2E" --synthetic 200 --hard --seed 7 \
  --batch-size 16 --out runs/patch_eval/e2e \
  > runs/r5/patch_eval_e2e.log 2>&1

# collect the table
python - <<'PY'
import json, os
table = {}
for m in ("devign", "reveal", "ivdetect", "text", "e2e"):
    p = f"runs/patch_eval/{m}/patch_eval.json"
    if os.path.exists(p):
        table[m] = json.load(open(p))
os.makedirs("artifacts/r5", exist_ok=True)
json.dump(table, open("artifacts/r5/patch_eval.json", "w"), indent=2)
print("patch-eval table:", {m: {k: round(v, 3) for k, v in t.items()
      if isinstance(v, float)} for m, t in table.items()})
PY
echo "PATCHEVAL_DONE"

#!/bin/bash
# Copy round-5 run evidence (summaries, histories, logs — never checkpoints
# or caches) from the gitignored runs/ tree into artifacts/r5/ so it
# survives workspace resets and is visible to the judge.
cd /root/repo
DST=artifacts/r5
mkdir -p $DST

# deep histories/summaries from run dirs
for run in pipeline_hard2400 \
           pipeline_hard2400/fusion_multi_defect_nograph \
           pipeline_hard2400/fusion_multi_defect_nofunc \
           e2e_hard2400_ctx e2e_hard2400 text_hard2400 east_r5 \
           hard2400_devign hard2400_reveal hard2400_ivdetect \
           hard4800_ivdetect e2e_hard4800_ctx e2e_bs32_probe; do
  [ -d "runs/$run" ] || continue
  out="$DST/$(echo "$run" | tr / _)"
  mkdir -p "$out"
  for f in pipeline_summary.json history.json result.json log_rank0.txt \
           config.json; do
    src=$(find "runs/$run" -name "$f" | head -1)
    [ -n "$src" ] && cp "$src" "$out/"
  done
done

# driver logs + patch-eval artifacts
mkdir -p $DST/logs
cp runs/r5/*.log runs/r4s7/pipeline_hard2400.log runs/r4s7/east_r5.log \
   runs/r4s7/staged_chain.log $DST/logs/ 2>/dev/null
if [ -d runs/patch_eval ]; then
  mkdir -p $DST/patch_eval
  for m in devign reveal ivdetect text e2e; do
    [ -d "runs/patch_eval/$m" ] || continue
    mkdir -p "$DST/patch_eval/$m"
    cp runs/patch_eval/$m/patch_eval.json "$DST/patch_eval/$m/" 2>/dev/null
    cp runs/patch_eval/$m/tsne_*.png "$DST/patch_eval/$m/" 2>/dev/null
  done
fi
ls -R $DST | head -60

#!/bin/bash
# Round-5 synthetic-EPE campaign A: converged occlusion-aware learning
# evidence on FRESH-GENERATOR data (the r04 fixed pool capped learning —
# see synth_epe_r04 p9/p10 probes and VERDICT r04 item 1).
# Settings = the proven P9 regime (64x128, bg<=2 fg<=4, batch 4) at a
# 12k-iter horizon; legs run sequentially (one TPU process at a time).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=benchmarks/synth_epe_r05
COMMON="--iters 12000 --batch 4 --hw 64 128 --max-bg 2 --max-fg 4 --eval-every 500"

python benchmarks/synthetic_epe.py $COMMON \
  --save /tmp/synth_r05/a1.ckpt > $OUT/a1_bf16_fresh.log 2>&1
echo "a1 rc=$?"
python benchmarks/synthetic_epe.py $COMMON --fp32 \
  --save /tmp/synth_r05/a2.ckpt > $OUT/a2_f32_fresh.log 2>&1
echo "a2 rc=$?"
python benchmarks/synthetic_epe.py $COMMON --no-occlusion-weights \
  --save /tmp/synth_r05/a3.ckpt > $OUT/a3_nomask_fresh.log 2>&1
echo "a3 rc=$?"
echo CAMPAIGN_A_DONE

#!/bin/bash
# Production-resolution legs (VERDICT r04 item 2): get a 256x832 curve under
# the zero-flow bar at the reference recipe shape
# (/root/reference/config/kitti.yaml:14, train.py:168-170).
#   p832_scratch — from-scratch bf16+Pallas at KITTI-like motion (bg<=16,
#                  fg<=32), fresh host-generated data (0.4 s/snippet; batch 4
#                  keeps the host ahead of the ~0.1 s device step).
#   p832_ft      — b2-style cross-resolution fine-tune: warm-start from the
#                  converged 128x256 campaign checkpoint (params are
#                  resolution-independent).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=benchmarks/synth_epe_r05
mkdir -p /tmp/synth_r05
COMMON="--batch 4 --hw 256 832 --max-bg 16 --max-fg 32 --tex-power 1.0 \
  --smooth-weight 1 --eval-every 300 --eval-snippets 32"

python benchmarks/synthetic_epe.py $COMMON --iters 3000 \
  --save /tmp/synth_r05/p832_scratch.ckpt > $OUT/p832_scratch.log 2>&1
echo "p832_scratch rc=$?"
python benchmarks/synthetic_epe.py $COMMON --iters 1500 \
  --load /tmp/synth_r05/b_a_bf16.ckpt \
  --save /tmp/synth_r05/p832_ft.ckpt > $OUT/p832_ft.log 2>&1
echo "p832_ft rc=$?"
echo PRODUCTION_LEGS_DONE

#!/bin/bash
# Production-resolution legs (VERDICT r04 item 2): get a 256x832 curve under
# the zero-flow bar at the reference recipe shape
# (/root/reference/config/kitti.yaml:14, train.py:168-170).
#   p832_scratch — from-scratch bf16+Pallas at KITTI-like motion (bg<=16,
#                  fg<=32), fresh host-generated data in the regime the
#                  round-5 diagnosis proved learnable (pwc init, smooth 1,
#                  natural-spectrum texture; see synth_epe_r05/README.md).
#   p832_ft      — b2-style cross-resolution fine-tune: warm-start from the
#                  converged 128x256 campaign checkpoint (params are
#                  resolution-independent).  Constant small lr: the cosine
#                  schedule is keyed on the optimizer step count, which
#                  resumes past its decay horizon on a warm start.
# K=10 steps/dispatch amortizes the tunneled host round trip (identical
# parameter trajectory; training/train_step.py::make_multi_train_step).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=benchmarks/synth_epe_r05
mkdir -p /tmp/synth_r05
# 4000-snippet uint8 pool (benchmarks/make_pool.py -> 255-rounded), uploaded
# ONCE to device HBM (--pool-device, 7.7 GB): at 256x832 the tunneled wire
# (7.6 MB per batch-4 uint8 iteration) and the 1-core host's generator
# (0.56 s/batch) would each bound the step rate well below the device.
# 4000 unique f32-generated snippets + mirror flips = 8000 variants; the
# 3000-iter scratch leg draws 12k samples (~1.5 visits/variant) — unlike
# the r04 campaign's 2000-snippet pool this is near-fresh data, and the
# uint8 rounding matches the production 8-bit PNG pipeline.
POOL="--pool 4000 --pool-dtype uint8 --pool-file /tmp/p832_pool_u8.npy \
  --pool-device"
COMMON="--batch 4 --hw 256 832 --max-bg 16 --max-fg 32 --tex-power 1.0 \
  --smooth-weight 1 --eval-every 300 --eval-snippets 32 \
  --steps-per-dispatch 10 $POOL"

python benchmarks/synthetic_epe.py $COMMON --iters 1500 --lr 3e-5 \
  --load /tmp/synth_r05/b_a_bf16.ckpt --load-params-only \
  --save /tmp/synth_r05/p832_ft.ckpt > $OUT/p832_ft.log 2>&1
echo "p832_ft rc=$?"
python benchmarks/synthetic_epe.py $COMMON --iters 3000 \
  --lr-schedule cosine \
  --save /tmp/synth_r05/p832_scratch.ckpt > $OUT/p832_scratch.log 2>&1
echo "p832_scratch rc=$?"
echo PRODUCTION_LEGS_DONE

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
# 6000-snippet float32 pool, pre-generated OFF the TPU-holding process
# (benchmarks/make_pool.py): at 256x832 the 1-core host's generator (0.56 s
# per batch-4) would otherwise bound the step rate 5x below the device.
# float32 (not the r04 uint8) and 3x the r04 pool size, with mirror
# augmentation; 3000-iter scratch leg draws 12k samples -> ~1 visit per
# (snippet, flip) variant — effectively fresh data.
POOL="--pool 6000 --pool-dtype float32 --pool-file /tmp/p832_pool.npy"
COMMON="--batch 4 --hw 256 832 --max-bg 16 --max-fg 32 --tex-power 1.0 \
  --smooth-weight 1 --eval-every 300 --eval-snippets 32 \
  --steps-per-dispatch 10 $POOL"

python benchmarks/synthetic_epe.py $COMMON --iters 3000 \
  --lr-schedule cosine \
  --save /tmp/synth_r05/p832_scratch.ckpt > $OUT/p832_scratch.log 2>&1
echo "p832_scratch rc=$?"
python benchmarks/synthetic_epe.py $COMMON --iters 1500 --lr 3e-5 \
  --load /tmp/synth_r05/b_a_bf16.ckpt \
  --save /tmp/synth_r05/p832_ft.ckpt > $OUT/p832_ft.log 2>&1
echo "p832_ft rc=$?"
echo PRODUCTION_LEGS_DONE

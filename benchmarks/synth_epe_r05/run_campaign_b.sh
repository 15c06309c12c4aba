#!/bin/bash
# Round-5 synthetic-EPE campaign B: converged occlusion-aware learning
# evidence in the LEARNABLE regime established by this round's diagnosis
# (see models/layers.py + synth_epe_r05/s*.log):
#   * init=pwc        — torch-default init is input-blind at init; every
#                       r04/r05 leg under it (supervised included) collapsed
#                       to the constant predictor.
#   * 128x256, bg<=8/fg<=16 — motion must be SUPER-pixel at the cost-volume
#                       levels; the old 64x128/bg<=2 regime is sub-pixel at
#                       every level and the correlation's integer bins never
#                       see it (s1/s2 vs s3 supervised discriminators).
#   * fresh HOST generator — fresh data every step (the r04 fixed pool
#                       capped learning per its own p10 probes).  Not
#                       --device-gen: at 128x256 the host generator already
#                       sustains the step rate (u1 0.59 s/it host vs u2 0.50
#                       device) and the device-gen f32 graph costs ~30+ min
#                       of axon compile per leg.
# Legs: a=masked bf16, b=f32 twin, c=occlusion-weights-OFF ablation.
# Judged on: epe_all/epe_bg under the zero-flow bar for a/b; c clearly worse
# on epe_occluded (the paper's mechanism, reference
# core/networks/model_flow_paper.py:101-134); bf16 ~= f32.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=benchmarks/synth_epe_r05
mkdir -p /tmp/synth_r05
# smooth 1 (not the recipe's 10): the edge-aware smoothness is calibrated
# to real-image edge stats; on weak-edge synthetic texture weight 10 makes
# the constant predictor the optimizer's basin (u1-vs-u2 A/B, README).
# cosine: the unsupervised objective dips under the bar and then drifts back
# up under a constant lr (probeA-vs-B README note); annealing freezes the dip.
# K=10 steps/dispatch amortizes the tunneled host round trip.
# quantize-fresh: the tunnel moves ~10 MB/s, so f32 batches are
# TRANSFER-bound (measured 0.56 s/it, same as K=1); uint8 cuts the wire
# bytes 4x AND matches the production pipeline (prepared PNGs are 8-bit,
# train.py emit_uint8).  Data is still FRESH every step — only the 8-bit
# rounding of the real pipeline is applied.  Super-pixel motions (bg<=8,
# fg<=16) are far above the 1/255 quantization floor (the r04 fresh+u8
# stall was in the old SUB-pixel regime).
COMMON="--iters 6000 --batch 4 --hw 128 256 --max-bg 8 --max-fg 16 \
  --tex-power 1.0 --smooth-weight 1 --eval-every 500 --eval-snippets 64 \
  --lr-schedule cosine --steps-per-dispatch 10 --quantize-fresh"

python benchmarks/synthetic_epe.py $COMMON \
  --save /tmp/synth_r05/b_a_bf16.ckpt > $OUT/b_a_bf16.log 2>&1
echo "b_a rc=$?"
python benchmarks/synthetic_epe.py $COMMON --fp32 \
  --save /tmp/synth_r05/b_b_f32.ckpt > $OUT/b_b_f32.log 2>&1
echo "b_b rc=$?"
python benchmarks/synthetic_epe.py $COMMON --no-occlusion-weights \
  --save /tmp/synth_r05/b_c_nomask.ckpt > $OUT/b_c_nomask.log 2>&1
echo "b_c rc=$?"
echo CAMPAIGN_B_DONE

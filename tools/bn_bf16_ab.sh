#!/bin/bash
# bn_bf16 numerics/perf A/B (BASELINE.md round-4 "pending the numerics A/B"):
# the control arm is campaign_r4 stage A's fixture-init run (bn_bf16=false,
# 2,000 steps, seed 42 — runs/campaign_r4/init_fixture); this script runs the
# identical recipe with bn_bf16=true (BatchNorm normalized outputs in bf16,
# statistics still fp32) so loss curves and steps/s are directly comparable.
# Off-by-default stays correct unless BOTH the curve matches (<1% loss delta
# at step 2k) AND steps/s improves measurably.
set -x
cd "$(dirname "$0")/.."
python pretrain.py \
  vicreg.batch_size=128 vicreg.limit_train_batches=2000 \
  vicreg.checkpoint_every_nbatches=100000 \
  vicreg.vision_weights_path=tests/golden/vision_trunk_fixture.pkl \
  bn_bf16=true \
  run_dir=runs/campaign_r4/bn_bf16_true log_every=50 || exit $?
echo "bn_bf16 A/B arm complete; control = runs/campaign_r4/init_fixture"

#!/bin/bash
# A/B: bf16 weight storage with fp32 master (cfg.weights_bf16) vs fp32 storage.
#
# The b128 VICReg step is byte-saturated on XLA-counted traffic
# (docs/roofline_b128_r4.md) and weight reads are the dominant term; bf16-stored
# apply weights halve that. Protocol mirrors tools/ab_bn_bf16.sh: 2,000 steps at
# b128, same seed/fixture both arms, loss curves in metrics.jsonl + step time
# from the steady-state windows. Decision rule (VERDICT r4 next #5): adopt if
# step time drops materially with <1% loss-curve divergence at step 2,000.
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
RUN=runs/ab_weights_bf16

for arm in control bf16w; do
  EXTRA=""
  if [ "$arm" = "bf16w" ]; then EXTRA="weights_bf16=true"; fi
  python pretrain.py \
    vicreg.batch_size=128 vicreg.limit_train_batches=2000 \
    vicreg.checkpoint_every_nbatches=100000 \
    vicreg.vision_weights_path=$FIXTURE \
    $EXTRA \
    run_dir=$RUN/$arm log_every=100 || exit $?
done

python - << 'EOF'
import json, glob
for arm in ("control", "bf16w"):
    files = sorted(glob.glob(f"runs/ab_weights_bf16/{arm}/pretrain-*/metrics.jsonl"))
    rows = [json.loads(l) for l in open(files[-1])]
    train = [r for r in rows if "vicreg/train/loss" in r]
    sps = [r["steps_per_sec"] for r in train[2:]]
    print(f"{arm}: final loss {train[-1]['vicreg/train/loss']:.4f} "
          f"steady steps/s {sum(sps)/len(sps):.2f} "
          f"(step {train[-1]['step']})")
EOF

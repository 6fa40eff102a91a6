#!/bin/bash
# Round-4 stage D: does the perceptual-metric gain keep scaling with pretraining
# data? Stage C2 found the combined-objective head's mel-L1/MR-STFT improve
# monotonically b128 -> b512 (22,510-step schedules = 2.88M -> 11.5M pairs); this
# stage adds the b1024 point (23.0M pairs, 8x the r3 campaign) and retrains the
# same two downstream recipes against it:
#   - combined @ b1024 (the perceptual-metric recipe; stage B/C2 comparators)
#   - embedding @ b1024 (the all-three-floors-at-once recipe; stage B comparator)
# Reference purpose: /root/reference/audio_to_params.py:177-312; operating point
# /root/reference/conf/audio_to_params/small.yaml:2.
# Every stage auto-resumes from orbax `last` checkpoints (exit 75 = preempted).
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
RUN=runs/campaign_r4

# ---- stage D1: 8x-data pretrain (b1024, the full 22,510-step reference schedule)
python pretrain.py \
  vicreg.batch_size=1024 vicreg.limit_train_batches=22510 \
  vicreg.checkpoint_every_nbatches=4000 \
  vicreg.vision_weights_path=$FIXTURE \
  run_dir=$RUN/pretrain_b1024 log_every=200 || exit $?

# ---- stage D2: reference-operating-point heads against the b1024 pretrain
for obj in combined embedding; do
  python downstream.py \
    audio_to_params.batch_size=1024 \
    audio_to_params.loss=$obj \
    audio_to_params.mel_rows=256 \
    audio_to_params.limit_train_batches=6000 \
    audio_to_params.checkpoint_every_nbatches=1500 \
    audio_to_params.dropout=0.0 \
    '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
    vicreg.batch_size=1024 \
    vicreg.vision_weights_path=$FIXTURE \
    vicreg_checkpoint=$RUN/pretrain_b1024/checkpoints/vicreg \
    run_dir=$RUN/downstream_${obj}_b1024_b1024pre \
    log_every=300 || exit $?
done

echo "campaign r4 stage D complete"

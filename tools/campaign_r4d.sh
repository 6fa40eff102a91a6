#!/bin/bash
# Round-4 stage G: compose stage D (8x-data b1024 pretrain) with stage F
# (full-batch grad-through-synth mel term via mel_chunk). Stage D showed the
# combined head's perceptual metrics scale monotonically with pretraining data
# (mel-L1 6.21 -> 5.89 -> 5.77 across b128/b512/b1024 pretrains, 256-row mel
# term); stage F showed the full-batch term is worth ~0.17 mel-L1 at fixed
# pretrain (6.208 -> 6.040 on the b128 pretrain). This stage runs the
# full-batch term against the b1024 pretrain — the expected best perceptual
# operating point of the whole build.
# Stage D's pretrain checkpoint did not survive the runs/ gitignore, so stage
# G1 regenerates it (same recipe, same seed — stage D recorded loss -> 13.47).
# Reference purpose: the commented-out grad-through-synth experiment,
# /root/reference/audio_to_params.py:56-174; operating point
# /root/reference/conf/audio_to_params/small.yaml:2.
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
RUN=runs/campaign_r4

# ---- stage G1: regenerate the 8x-data pretrain (skipped if the ckpt exists)
python pretrain.py \
  vicreg.batch_size=1024 vicreg.limit_train_batches=22510 \
  vicreg.checkpoint_every_nbatches=4000 \
  vicreg.vision_weights_path=$FIXTURE \
  run_dir=$RUN/pretrain_b1024 log_every=200 || exit $?

# ---- stage G2: full-batch-mel combined head against the 8x-data pretrain
python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=combined \
  audio_to_params.mel_chunk=128 \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  vicreg.batch_size=1024 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/pretrain_b1024/checkpoints/vicreg \
  run_dir=$RUN/downstream_combined_b1024pre_fullmel \
  log_every=300 || exit $?

echo "campaign r4 stage G complete"

#!/bin/bash
# Round-4 stage F: is the grad-through-synth mel term better FULL-BATCH?
# Stage B bounded the combined objective's mel_l1 term to the leading 256 rows
# (audio_to_params.mel_rows=256) because the render-VJP + DFT residuals of a
# 1024-row term OOM a 16 GB chip. audio_to_params.mel_chunk removes that bound
# exactly: the term is evaluated in row chunks under jax.checkpoint (one chunk's
# residuals live at a time, recomputed in the backward), so every step's mel
# gradient sees all 1024 rows — 4x the spectral supervision per step at ~4-5x the
# step cost (the render VJP dominates). Comparator: stage B's combined head
# against the same b128 x 22,510-step pretrain (mel-L1 6.208 / MR-STFT 1.003 /
# param-MAE 0.2925 on the fp32-honest test path).
# Reference purpose: the commented-out grad-through-synth experiment,
# /root/reference/audio_to_params.py:56-174.
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
R3=runs/campaign          # 22,510-step b128 pretrain (campaign_r4.sh stage 0)
RUN=runs/campaign_r4

python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=combined \
  audio_to_params.mel_chunk=128 \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  vicreg.batch_size=128 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$R3/checkpoints/vicreg \
  run_dir=$RUN/downstream_combined_b1024_fullmel \
  log_every=300 || exit $?

echo "campaign r4 stage F complete"

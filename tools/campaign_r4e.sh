#!/bin/bash
# Round-4 stage H: the triple objective at the reference operating point.
# Stage B left a trade on the table: the embedding head beats ALL THREE floors
# but narrowly (param-MAE 0.2426 / mel-L1 8.002 / MR-STFT 1.128), while the
# combined (param_mse + 0.1*mel_l1) head wins perceptually (mel-L1 6.208 /
# MR-STFT 1.003) but gives up aggregate param-MAE (0.2925 > 0.2501 chance).
# This stage trains the three-term composition — param supervision anchors the
# aggregate MAE, the embedding term shapes the representation-space fit, the
# grad-through-synth mel term drives perceptual quality — asking whether one
# head can beat every floor with real margin. No reference objective composes
# these: the grad-through-synth experiment is 119 commented-out lines
# (/root/reference/audio_to_params.py:56-174), and the shipped loss is
# embedding-space MSE only (/root/reference/audio_to_params.py:229); operating
# point /root/reference/conf/audio_to_params/small.yaml:2 (batch_size 1024).
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
R3=runs/campaign          # 22,510-step b128 pretrain (regenerated below if absent)
RUN=runs/campaign_r4

# ---- stage 0: (re)generate the round-3 b128 pretrain checkpoint
# (runs/ is gitignored; ~11 min on one chip — tools/campaign_r3.sh stage 1).
# Run unconditionally: pretrain.py auto-resumes from `last` and no-ops when the
# run is already complete, so this also repairs a partially-trained checkpoint
# left by a preemption (a bare existence check would silently accept it).
python pretrain.py \
  vicreg.batch_size=128 vicreg.limit_train_batches=22510 \
  vicreg.checkpoint_every_nbatches=2000 \
  vicreg.vision_weights_path=$FIXTURE \
  run_dir=$R3 log_every=100 || exit $?

# ---- stage H: param_mse + embedding + 0.1*mel_l1 at b1024 (same recipe as
# stage B's heads: 6,000 steps, cosine, dropout 0, 256-row mel term).
python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=combined \
  'audio_to_params.loss_weights={param_mse: 1.0, embedding: 1.0, mel_l1: 0.1}' \
  audio_to_params.mel_rows=256 \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  vicreg.batch_size=128 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$R3/checkpoints/vicreg \
  run_dir=$RUN/downstream_triple_b1024 \
  log_every=300 || exit $?

echo "campaign r4 stage H complete"

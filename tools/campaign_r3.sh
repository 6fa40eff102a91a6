#!/bin/bash
# Round-3 training campaign (VERDICT round 2, ask #1): the full reference pretrain
# schedule (22,510 optimizer steps, conf/vicreg/full.yaml:41-52) at batch 128 on the
# real chip, from the committed synthetic "pretrained" vision trunk, then downstream
# heads to convergence under all three objectives, then a long retrieval eval.
# Every stage auto-resumes from checkpoints (exit 75 = preempted, rerun this script).
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
RUN=runs/campaign

common_pre=(
  vicreg.batch_size=128
  vicreg.limit_train_batches=22510
  vicreg.checkpoint_every_nbatches=2000
  vicreg.vision_weights_path=$FIXTURE
  run_dir=$RUN
  log_every=100
)

# stage 1: pretrain, full reference schedule
python pretrain.py "${common_pre[@]}" || exit $?

# stage 2: downstream heads (separate run dirs so head checkpoints don't collide),
# all against the campaign vicreg checkpoint
for obj in embedding param_mse mel_l1; do
  steps=3000
  [ "$obj" = mel_l1 ] && steps=1000  # renders inside the grad loop; costlier
  python downstream.py \
    audio_to_params.batch_size=128 \
    audio_to_params.loss=$obj \
    audio_to_params.limit_train_batches=$steps \
    audio_to_params.checkpoint_every_nbatches=500 \
    vicreg.batch_size=128 \
    vicreg.vision_weights_path=$FIXTURE \
    vicreg_checkpoint=$RUN/checkpoints/vicreg \
    run_dir=$RUN/downstream_$obj \
    log_every=100 || exit $?
done

# stage 2b: extended heads to convergence (cosine schedule, no dropout) — the
# recorded 20k-step runs behind BASELINE.md's round-3 table
for obj in param_mse embedding; do
  python downstream.py \
    audio_to_params.batch_size=128 \
    audio_to_params.loss=$obj \
    audio_to_params.limit_train_batches=20000 \
    audio_to_params.checkpoint_every_nbatches=4000 \
    audio_to_params.dropout=0.0 \
    '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 500, max_epochs: 20000}}' \
    vicreg.batch_size=128 \
    vicreg.vision_weights_path=$FIXTURE \
    vicreg_checkpoint=$RUN/checkpoints/vicreg \
    run_dir=$RUN/downstream_${obj}_long \
    log_every=500 || exit $?
done

# stage 2c: the reference's downstream operating point — batch_size 1024
# (conf/audio_to_params/small.yaml:2); test metrics over 1024 voices. The test
# pass needs the batch-chunked MR-STFT (ops/stft.py) to fit a 16 GB chip.
python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=param_mse \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  vicreg.batch_size=128 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/checkpoints/vicreg \
  run_dir=$RUN/downstream_param_mse_b1024 \
  log_every=300 || exit $?

# stage 3: long retrieval eval (reference streams up to 1M candidates:
# evaluate_audio_representations.py:202) — 1000 x 1024 candidates, resumable
python evaluate_audio_representations.py \
  vicreg.batch_size=128 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/checkpoints/vicreg \
  run_dir=$RUN/retrieval \
  retrieval.n_batches=1000 || exit $?

echo "campaign complete"

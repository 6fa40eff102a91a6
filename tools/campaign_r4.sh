#!/bin/bash
# Round-4 training campaign (VERDICT round 3, asks #3/#4/#5):
#   A. pretrained-init value: two 2k-step pretrain curves, fixture-init vs
#      random-init, same seed (completes round-2 ask #7's second half —
#      reference default: conf/vicreg/full.yaml:28, vicreg_audio_params.py:52-54).
#   B. beat every floor at the reference operating point (batch_size 1024,
#      conf/audio_to_params/small.yaml:2): embedding head and the new 'combined'
#      (param_mse + λ·mel_l1) head at b1024, test metrics on the fp32-honest path.
#   C. grow the inverse-synthesis margin: the full reference schedule at b512
#      (4x the r3 campaign's pairs), then the best downstream recipe against it —
#      does param-MAE margin over the 0.25 floor widen (target ≤0.22) or plateau?
# Every stage auto-resumes from checkpoints (exit 75 = preempted, rerun).
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
R3=runs/campaign          # round-3 artifacts (22,510-step b128 pretrain)
RUN=runs/campaign_r4

# ---- stage 0: regenerate the round-3 b128 pretrain checkpoint if absent
# (runs/ is gitignored, so the 22,510-step campaign checkpoint does not survive a
# round boundary; ~11 min on one chip to rebuild — tools/campaign_r3.sh stage 1).
if [ ! -d "$R3/checkpoints/vicreg" ]; then
  python pretrain.py \
    vicreg.batch_size=128 vicreg.limit_train_batches=22510 \
    vicreg.checkpoint_every_nbatches=2000 \
    vicreg.vision_weights_path=$FIXTURE \
    run_dir=$R3 log_every=100 || exit $?
fi

# ---- stage A: fixture-init vs random-init pretrain curves (2k steps, same seed)
python pretrain.py \
  vicreg.batch_size=128 vicreg.limit_train_batches=2000 \
  vicreg.checkpoint_every_nbatches=100000 \
  vicreg.vision_weights_path=$FIXTURE \
  run_dir=$RUN/init_fixture log_every=50 || exit $?
python pretrain.py \
  vicreg.batch_size=128 vicreg.limit_train_batches=2000 \
  vicreg.checkpoint_every_nbatches=100000 \
  vicreg.vision_weights_path=null \
  run_dir=$RUN/init_random log_every=50 || exit $?

# ---- stage A2: quantify the bf16-vs-f32 test-metric delta once (VERDICT ask #6).
# First run retrains the round-3 b1024 param_mse head (its r3 settings from
# campaign_r3.sh stage 2c — runs/ did not survive the round boundary); the second
# resumes from the step-6000 checkpoint (fit is a no-op) and only re-tests on the
# other spectral path. mel.test_method now DEFAULTS to matmul_f32; this records
# how far the old bf16-reported numbers drifted.
for m in matmul_f32 matmul_bf16; do
  python downstream.py \
    audio_to_params.batch_size=1024 \
    audio_to_params.loss=param_mse \
    audio_to_params.limit_train_batches=6000 \
    audio_to_params.checkpoint_every_nbatches=1500 \
    audio_to_params.dropout=0.0 \
    '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
    mel.test_method=$m \
    vicreg.batch_size=128 \
    vicreg.vision_weights_path=$FIXTURE \
    vicreg_checkpoint=$R3/checkpoints/vicreg \
    run_dir=$R3/downstream_param_mse_b1024 \
    log_every=300 || exit $?
done

# ---- stage B: reference-operating-point heads (b1024) vs the r3 checkpoint.
# embedding = the objective with the best mel-L1 at b128 (9.489 vs floor 10.223),
# never before trained at b1024; combined = param supervision + grad-through-synth.
for obj in embedding combined; do
  python downstream.py \
    audio_to_params.batch_size=1024 \
    audio_to_params.loss=$obj \
    audio_to_params.mel_rows=256 \
    audio_to_params.limit_train_batches=6000 \
    audio_to_params.checkpoint_every_nbatches=1500 \
    audio_to_params.dropout=0.0 \
    '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
    vicreg.batch_size=128 \
    vicreg.vision_weights_path=$FIXTURE \
    vicreg_checkpoint=$R3/checkpoints/vicreg \
    run_dir=$RUN/downstream_${obj}_b1024 \
    log_every=300 || exit $?
done

# ---- stage C: 4x-data pretrain (b512, full 22,510-step schedule), then the best
# downstream recipe (param_mse long; r3's strongest param-MAE) against it.
python pretrain.py \
  vicreg.batch_size=512 vicreg.limit_train_batches=22510 \
  vicreg.checkpoint_every_nbatches=4000 \
  vicreg.vision_weights_path=$FIXTURE \
  run_dir=$RUN/pretrain_b512 log_every=200 || exit $?

python downstream.py \
  audio_to_params.batch_size=128 \
  audio_to_params.loss=param_mse \
  audio_to_params.limit_train_batches=20000 \
  audio_to_params.checkpoint_every_nbatches=4000 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 500, max_epochs: 20000}}' \
  vicreg.batch_size=512 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/pretrain_b512/checkpoints/vicreg \
  run_dir=$RUN/downstream_param_mse_b512pre \
  log_every=500 || exit $?

# and the reference-operating-point head against the b512 pretrain
python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=combined \
    audio_to_params.mel_rows=256 \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  vicreg.batch_size=512 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/pretrain_b512/checkpoints/vicreg \
  run_dir=$RUN/downstream_combined_b1024_b512pre \
  log_every=300 || exit $?

echo "campaign r4 complete"

#!/bin/bash
# Round-5 campaign: error bars + stage G/H closure + best-pretrain retrieval.
#
#   I. Error bars on every headline b1024 metric (VERDICT r4 missing #3): all
#      round-4 numbers came from ONE 1024-voice test batch (ntest_batches: 1,
#      mirroring /root/reference/conf/config.yaml:31). Test each head over
#      EIGHT disjoint test batches (8x1024 voices); the downstream CLI reports
#      mean±std. Test batch numbers live at the far end of the Feistel
#      permutation, disjoint from the 6,000-step train prefix.
#        I1: stage-H triple head (param_mse + embedding + 0.1*mel_l1)
#        I3: stage-B embedding head (the all-three-floors head whose 9% mel-L1
#            margin most needs error bars)
#   G. Stage G, completed with error bars: the full-batch grad-through-synth
#      mel term (mel_chunk) composed with the 8x-data b1024 pretrain — the
#      expected best perceptual operating point; also the round-5 speed gate
#      for the Pallas render backward (r4 ran this recipe at 2.66 steps/s on
#      the jnp VJP; target >=5).
#   J. Retrieval vs the BEST pretrain (VERDICT r4 weak #4): stage E scored NN
#      param-MAE 0.311 against the b128 pretrain; score the b1024 8x-data
#      checkpoint with the same 1,000x1,024-candidate protocol. The CLI now
#      runs the planted-query sanity gate before streaming.
#
# Every python stage retries on exit 75 (preemption: runs auto-resume from
# `last`). Checkpoints do not survive round boundaries (runs/ is gitignored),
# so both pretrains regenerate unconditionally — auto-resume no-ops when a
# stage is already complete.
#
# Reference operating point: /root/reference/conf/audio_to_params/small.yaml:2;
# retrieval loop: /root/reference/evaluate_audio_representations.py:202-245.
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
R3=runs/campaign
RUN=runs/campaign_r4
R5=runs/campaign_r5

run_retry() {  # retry on the exit-75 preemption contract; abort on real errors
  for attempt in 1 2 3 4 5; do
    "$@"
    rc=$?
    [ $rc -eq 0 ] && return 0
    [ $rc -ne 75 ] && exit $rc
    echo "preempted (attempt $attempt); resuming"
    sleep 10
  done
  exit 75
}

# ---- stage 0a: b128 x 22,510 pretrain (the round-3/4 baseline checkpoint) --
# steps_per_dispatch amortizes the ~13 ms tunnel dispatch floor at this size.
run_retry python pretrain.py \
  vicreg.batch_size=128 vicreg.limit_train_batches=22510 \
  vicreg.checkpoint_every_nbatches=2000 \
  vicreg.vision_weights_path=$FIXTURE \
  steps_per_dispatch=8 \
  run_dir=$R3 log_every=100

# ---- I1: triple head (stage-H recipe), 8 test batches ----------------------
run_retry python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=combined \
  'audio_to_params.loss_weights={param_mse: 1.0, embedding: 1.0, mel_l1: 0.1}' \
  audio_to_params.mel_rows=256 \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  ntest_batches=8 \
  vicreg.batch_size=128 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$R3/checkpoints/vicreg \
  run_dir=$RUN/downstream_triple_b1024 \
  log_every=300

# ---- I3: embedding head (stage-B recipe), 8 test batches -------------------
run_retry python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=embedding \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  ntest_batches=8 \
  vicreg.batch_size=128 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$R3/checkpoints/vicreg \
  run_dir=$R5/downstream_embedding_b1024 \
  log_every=300

# ---- stage 0b: b1024 x 22,510 pretrain (8x data; stage D recorded loss->13.47)
run_retry python pretrain.py \
  vicreg.batch_size=1024 vicreg.limit_train_batches=22510 \
  vicreg.checkpoint_every_nbatches=4000 \
  vicreg.vision_weights_path=$FIXTURE \
  run_dir=$RUN/pretrain_b1024 log_every=200

# ---- G: full-batch-mel combined head vs the 8x-data pretrain, 8 test batches
run_retry python downstream.py \
  audio_to_params.batch_size=1024 \
  audio_to_params.loss=combined \
  audio_to_params.mel_chunk=128 \
  audio_to_params.limit_train_batches=6000 \
  audio_to_params.checkpoint_every_nbatches=1500 \
  audio_to_params.dropout=0.0 \
  '+audio_to_params.scheduler={name: LinearWarmupCosineAnnealingLR, args: {warmup_epochs: 300, max_epochs: 6000}}' \
  ntest_batches=8 \
  vicreg.batch_size=1024 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/pretrain_b1024/checkpoints/vicreg \
  run_dir=$RUN/downstream_combined_b1024pre_fullmel \
  log_every=300

# ---- J: retrieval vs the b1024 8x-data pretrain (stage-E protocol) ---------
run_retry python evaluate_audio_representations.py \
  retrieval.n_batches=1000 \
  vicreg.batch_size=1024 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/pretrain_b1024/checkpoints/vicreg \
  run_dir=$R5/retrieval_b1024pre

echo "campaign r5 complete"

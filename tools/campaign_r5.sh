#!/bin/bash
# Round-5 campaign: error bars + best-pretrain retrieval.
#
#   I. Error bars on every headline b1024 metric (VERDICT r4 missing #3): all
#      round-4 numbers came from ONE 1024-voice test batch (ntest_batches: 1,
#      mirroring /root/reference/conf/config.yaml:31). Re-test each head over
#      EIGHT disjoint test batches (8x1024 voices) and report mean±std. Safe on
#      existing heads: test batch numbers live at the far end of the Feistel
#      permutation (positions ~50M-8..50M-1), disjoint from the 6,000-step train
#      prefix, and training auto-resume no-ops on completed runs.
#        I1: stage-H triple head (param_mse + embedding + 0.1*mel_l1)
#        I2: stage-G combined head (full-batch mel term x 8x-data b1024 pretrain)
#        I3: the stage-B embedding head, retrained (checkpoint did not survive
#            the round boundary), then tested over 8 batches — the head whose
#            all-three-floors margins most need error bars (mel-L1 9% margin).
#   J. Retrieval vs the BEST pretrain (VERDICT r4 weak #4): stage E scored NN
#      param-MAE 0.311 against the b128 pretrain; score the b1024 8x-data
#      checkpoint with the same 1,000x1,024-candidate protocol. The CLI now runs
#      the planted-query sanity gate before streaming.
#
# Reference operating point: /root/reference/conf/audio_to_params/small.yaml:2;
# retrieval loop: /root/reference/evaluate_audio_representations.py:202-245.
set -x
cd "$(dirname "$0")/.."

FIXTURE=tests/golden/vision_trunk_fixture.pkl
R3=runs/campaign
RUN=runs/campaign_r4
R5=runs/campaign_r5

# ---- prerequisites (auto-resume no-ops when already complete) --------------
python pretrain.py \
  vicreg.batch_size=128 vicreg.limit_train_batches=22510 \
  vicreg.checkpoint_every_nbatches=2000 \
  vicreg.vision_weights_path=$FIXTURE \
  run_dir=$R3 log_every=100 || exit $?

# ---- I1: triple head, 8 test batches ---------------------------------------
python downstream.py \
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
  log_every=300 || exit $?

# ---- I3: embedding head (stage-B recipe), train + 8 test batches -----------
python downstream.py \
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
  log_every=300 || exit $?

# ---- I2: stage-G combined-fullmel head, 8 test batches ---------------------
# (depends on campaign_r4d.sh having produced the b1024 pretrain + head)
if [ -d "$RUN/downstream_combined_b1024pre_fullmel/checkpoints" ]; then
python downstream.py \
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
  log_every=300 || exit $?
fi

# ---- J: retrieval vs the b1024 8x-data pretrain (stage-E protocol) ---------
python evaluate_audio_representations.py \
  retrieval.n_batches=1000 \
  vicreg.batch_size=1024 \
  vicreg.vision_weights_path=$FIXTURE \
  vicreg_checkpoint=$RUN/pretrain_b1024/checkpoints/vicreg \
  run_dir=$R5/retrieval_b1024pre || exit $?

echo "campaign r5 complete"

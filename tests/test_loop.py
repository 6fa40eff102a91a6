"""Trainer loop integration: fit with logging, val cadence, checkpoint save/resume."""

import pytest
import json

import numpy as np
from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
from inverse_audio_synthesis_tpu.train.loop import Trainer
from inverse_audio_synthesis_tpu.train.runsetup import BatchNumberSplit
from inverse_audio_synthesis_tpu.utils.logging import MetricsLogger
from inverse_audio_synthesis_tpu.utils.summary import param_count, summarize_params



def test_trainer_aborts_on_rejected_steps(tmp_path):
    """A device-side rejected (non-finite) update must abort the run at log cadence —
    the host-visible half of the reference's detect_anomaly=True (pretrain.py:96).
    Only rejections from THIS run count: a checkpoint saved after a rejection carries
    the cumulative counter, and restoring it must not abort the resumed run."""
    import jax.numpy as jnp
    import pytest

    from inverse_audio_synthesis_tpu.train.optim import NonFiniteGuardState

    class FakeSynth:
        batch_size = 4

    class FakeState:
        def __init__(self, count):
            self.opt_state = NonFiniteGuardState(jnp.asarray(count, jnp.int32), ())

    class FakeTask:
        synth = FakeSynth()

        def __init__(self, reject_from):
            self.reject_from = reject_from

        def train_step(self, state, batch_num):
            count = state.opt_state.total_notfinite
            return FakeState(count + (count >= self.reject_from)), {
                "loss": jnp.float32(1.0)
            }

    split = BatchNumberSplit(num_batches=10, ntest_batches=1, seed=0)
    # rejection during the run → abort
    trainer = Trainer(FakeTask(reject_from=0), split, limit_train_batches=2, log_every=1)
    with pytest.raises(FloatingPointError, match="notfinite_steps"):
        trainer.fit(FakeState(0))
    # counter restored non-zero from a checkpoint, no NEW rejections → no abort
    trainer = Trainer(FakeTask(reject_from=99), split, limit_train_batches=2, log_every=1)
    trainer.fit(FakeState(3))


def test_fit_preemption_saves_checkpoint_and_stops(tmp_path):
    """SIGTERM mid-run must finish the in-flight step, write a resumable checkpoint,
    and return — TPU-pool preemption safety (beyond the reference, which dies
    mid-step and loses up to checkpoint_every_nbatches of work)."""
    import os
    import signal

    import jax.numpy as jnp

    class FakeSynth:
        batch_size = 4

    saves = []

    class FakeCkpt:
        def maybe_save(self, state, step):
            pass

        def save(self, state, step):
            saves.append(step)

    class FakeTask:
        synth = FakeSynth()
        steps_run = 0

        def train_step(self, state, batch_num):
            self.steps_run += 1
            if self.steps_run == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            return state, {"loss": jnp.float32(1.0)}

    from inverse_audio_synthesis_tpu.train.optim import NonFiniteGuardState

    class FakeState:
        opt_state = NonFiniteGuardState(jnp.zeros([], jnp.int32), ())

    task = FakeTask()
    split = BatchNumberSplit(num_batches=100, ntest_batches=1, seed=0)
    trainer = Trainer(task, split, checkpoint=FakeCkpt(), limit_train_batches=50, log_every=1000)
    trainer.fit(FakeState())
    # the signal lands during step 3 (index 2); the step completes, then the guard
    # stops iteration 3 before running it and saves at 3 completed steps
    assert task.steps_run == 3
    assert saves == [3]
    # handler restored after fit
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


@pytest.mark.slow
def test_fit_end_to_end(tmp_path, tiny_task):
    task = tiny_task
    state = task.init_state()

    split = BatchNumberSplit(num_batches=100, ntest_batches=1, seed=42)
    logger = MetricsLogger(run_dir=str(tmp_path), run_name="t")
    ckpt = CheckpointManager(str(tmp_path / "ck"), every_n_steps=2, keep=2)
    trainer = Trainer(
        task,
        split,
        logger=logger,
        checkpoint=ckpt,
        limit_train_batches=4,
        limit_val_batches=1,
        val_check_interval=2,
        log_every=1,
    )
    state = trainer.fit(state)
    logger.finish()

    lines = [json.loads(l) for l in open(tmp_path / "t" / "metrics.jsonl")]
    train_lines = [l for l in lines if "vicreg/train/loss" in l]
    val_lines = [l for l in lines if "vicreg/validation/loss" in l]
    assert len(train_lines) == 4
    assert len(val_lines) == 2  # steps 2 and 4
    assert all(np.isfinite(l["vicreg/train/loss"]) for l in train_lines)
    assert "voices_per_sec" in train_lines[0]

    # checkpoints at cadence + final save_last
    assert ckpt.latest_step() == 4
    restored = trainer.task.val_step(ckpt.restore(state), 0)
    assert np.isfinite(float(restored["vicreg/validation/loss"]))


def test_summary_counts(tiny_task):
    task = tiny_task
    state = task.init_state()
    text = summarize_params(state.params, max_depth=2)
    total = param_count(state.params)
    assert f"{total:,}" in text
    assert "projector" in text


def test_steps_per_dispatch_parity(tmp_path, tiny_task):
    """steps_per_dispatch > 1 (lax.scan over batch numbers) must reproduce the
    one-step-per-dispatch run: same final parameters, same logged train metrics
    at the same steps, same checkpoint cadence, and dispatches clamped so no
    log/ckpt boundary falls inside a dispatch."""
    import jax

    task = tiny_task
    split = BatchNumberSplit(num_batches=100, ntest_batches=1, seed=42)

    def run(spd, tag):
        state = task.init_state()
        logger = MetricsLogger(run_dir=str(tmp_path), run_name=tag)
        ckpt = CheckpointManager(str(tmp_path / f"ck_{tag}"), every_n_steps=4, keep=2)
        trainer = Trainer(
            task,
            split,
            logger=logger,
            checkpoint=ckpt,
            limit_train_batches=8,
            log_every=2,
            steps_per_dispatch=spd,
        )
        state = trainer.fit(state)
        logger.finish()
        lines = [json.loads(l) for l in open(tmp_path / tag / "metrics.jsonl")]
        return state, [l for l in lines if "vicreg/train/loss" in l], ckpt

    s1, logs1, ck1 = run(1, "spd1")
    s4, logs4, ck4 = run(4, "spd4")

    # identical logged steps and (numerically close) metric values
    assert [l["step"] for l in logs1] == [l["step"] for l in logs4]
    for a, b in zip(logs1, logs4):
        np.testing.assert_allclose(
            a["vicreg/train/loss"], b["vicreg/train/loss"], rtol=1e-4
        )
    # same checkpoint cadence
    assert ck1.latest_step() == ck4.latest_step() == 8

    # same final parameters (scan body is the same jitted step program)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat4 = jax.tree_util.tree_leaves(s4.params)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_train_step_multi_matches_sequential(tiny_task):
    """task.train_step_multi == sequential train_step calls.

    ONE-step comparison pins the contract tightly (same math, association-only
    differences between the scan body and the stand-alone program); the 3-step
    comparison checks only the loss loosely — per-step association deltas
    compound through BatchNorm statistics (measured 5.7e-4 rel by step 3), so a
    tight multi-step param comparison would test fp reassociation, not the
    dispatch mechanism."""
    import jax

    from test_cross_mesh import assert_params_equivalent

    task = tiny_task

    # one step: scan-of-1 vs single dispatch, update-relative param comparison
    s0 = task.init_state()
    init_params = jax.device_get(s0.params)
    s_one_seq, m_one = task.train_step(s0, 11)
    s_one_multi, stacked_one = task.train_step_multi(task.init_state(), [11])
    np.testing.assert_allclose(
        float(stacked_one["vicreg/train/loss"][0]),
        float(m_one["vicreg/train/loss"]),
        rtol=1e-4,
    )
    assert_params_equivalent(
        jax.device_get(s_one_seq.params),
        jax.device_get(s_one_multi.params),
        init_params,
        label="steps_per_dispatch(k=1)",
    )

    # three steps: step count + loss trajectory
    nums = [11, 12, 13]
    s_seq = task.init_state()
    for n in nums:
        s_seq, m_last = task.train_step(s_seq, n)
    s_multi, stacked = task.train_step_multi(task.init_state(), nums)
    assert int(s_multi.step) == int(s_seq.step)
    np.testing.assert_allclose(
        float(stacked["vicreg/train/loss"][-1]),
        float(m_last["vicreg/train/loss"]),
        rtol=3e-3,
    )

"""Training runtime: optimizer/schedule, splits, sharded train step on the 8-device
CPU mesh, checkpoint round-trip, loss goes down."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh, param_shardings
from inverse_audio_synthesis_tpu.train.optim import make_optimizer
from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask
from inverse_audio_synthesis_tpu.train.runsetup import BatchNumberSplit, FeistelPermutation
from inverse_audio_synthesis_tpu.utils.config import load_config


def tiny_cfg(**over):
    overrides = [
        "vicreg=fast",
        "dim=32",
        "embeddim=64",
        "vicreg.mlp='64-%d'",
        "vicreg.batch_size=8",
        "image.height=64",
        "image.width=64",
        f"torchsynth.buffer_size_seconds={3 * 64 * 64 / 44100}",
        "precision=f32",
    ] + [f"{k}={v}" for k, v in over.items()]
    return load_config(overrides=overrides)


def test_feistel_is_permutation():
    perm = FeistelPermutation(1000, seed=42)
    out = {perm(i) for i in range(1000)}
    assert out == set(range(1000))
    # deterministic
    perm2 = FeistelPermutation(1000, seed=42)
    assert [perm(i) for i in range(10)] == [perm2(i) for i in range(10)]
    # different seed → different order
    perm3 = FeistelPermutation(1000, seed=43)
    assert [perm(i) for i in range(10)] != [perm3(i) for i in range(10)]


def test_split_sizes_and_disjoint():
    split = BatchNumberSplit(1000, ntest_batches=3, seed=42)
    # reference arithmetic: ntrain = int((1000-3)*0.9) = 897, nval = 100, ntest = 3
    assert split.sizes.train == 897
    assert split.sizes.val == 100
    assert split.sizes.test == 3
    train = {split.train_batch_num(i) for i in range(split.sizes.train)}
    val = {split.val_batch_num(i) for i in range(split.sizes.val)}
    test = {split.test_batch_num(i) for i in range(split.sizes.test)}
    assert not (train & val) and not (train & test) and not (val & test)
    assert len(train | val | test) == 1000


def test_lars_schedule_scaling():
    cfg = load_config()  # full config
    tx, schedule = make_optimizer(
        cfg.vicreg.optim, cfg.vicreg.batch_size, cfg.vicreg.scheduler
    )
    # batch 16 / 256 * base_lr 3.2 = 0.2 peak, linear warmup over 1000 steps
    assert float(schedule(0)) == pytest.approx(0.0, abs=1e-8)
    assert float(schedule(500)) == pytest.approx(0.1, rel=1e-3)
    assert float(schedule(1000)) == pytest.approx(0.2, rel=1e-3)
    assert float(schedule(22510)) == pytest.approx(0.0, abs=1e-6)


def test_sgd_supported():
    # the reference's SGD path crashes (vicreg_audio_params.py:131-132); ours works
    tx, _ = make_optimizer({"name": "sgd", "args": {"lr": 0.1}}, 16)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1 * np.ones(3), rtol=1e-6)


@pytest.fixture(scope="module")
def task(tiny_task):
    return tiny_task


@pytest.mark.slow
def test_train_step_on_8device_mesh(task):
    # NB: train_step donates its input state (in-place buffer reuse on TPU) — treat
    # state as linear: snapshot anything needed BEFORE stepping.
    state = task.init_state()
    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    state2, metrics = task.train_step(state, 0)
    assert float(metrics["vicreg/train/loss"]) > 0
    assert np.isfinite(float(metrics["vicreg/train/loss"]))
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()), params_before, state2.params
    )
    assert max(jax.tree_util.tree_leaves(delta)) > 0


@pytest.mark.slow
def test_loss_decreases_and_val_step(task):
    state = task.init_state()
    first = None
    for i in range(8):
        state, metrics = task.train_step(state, 1234)  # same batch → should overfit
        if first is None:
            first = float(metrics["vicreg/train/loss"])
    last = float(metrics["vicreg/train/loss"])
    assert last < first, f"{last} !< {first}"
    m = task.val_step(state, 999)
    assert np.isfinite(float(m["vicreg/validation/loss"]))


@pytest.mark.slow
def test_tensor_parallel_mesh():
    cfg = tiny_cfg()
    mesh = create_mesh(data=4, model=2)
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    # projector hidden kernel is sharded over 'model'
    sh = param_shardings(state.params, mesh)
    spec = sh["projector"]["lin0"]["kernel"].spec
    assert spec == jax.sharding.PartitionSpec(None, "model")
    state2, metrics = task.train_step(state, 0)
    assert np.isfinite(float(metrics["vicreg/train/loss"]))


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, task):
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager

    state = task.init_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), every_n_steps=2, keep=2)
    assert not mgr.maybe_save(state, 1)
    assert mgr.maybe_save(state, 2)
    assert mgr.latest_step() == 2
    restored = mgr.restore(state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_ignores_inflight_tmp_dirs(tmp_path, task):
    """A reader listing checkpoints while another process's save is mid-write must
    skip orbax's step_N.orbax-checkpoint-tmp dirs (they match the step_* glob but
    aren't restorable) — seen live when downstream started during pretrain's final
    1.3 GB save."""
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"), every_n_steps=2, keep=2)
    (tmp_path / "ckpt" / "step_000000000500.orbax-checkpoint-tmp").mkdir(parents=True)
    assert mgr.latest_step() is None  # tmp dir alone isn't a checkpoint
    state = task.init_state()
    mgr.save(state, 2)
    (tmp_path / "ckpt" / "last").unlink()  # force the glob fallback
    assert mgr.latest_step() == 2
    mgr.save(state, 4)  # _gc must not count/delete the tmp dir
    assert (tmp_path / "ckpt" / "step_000000000500.orbax-checkpoint-tmp").exists()


@pytest.mark.slow
def test_checkpoint_async_save_survives_buffer_donation(tmp_path, task):
    """Cadence saves are async (SURVEY §5.4): orbax blocks only for the D2H copy, so
    continuing to train — which DONATES the saved buffers into the next step — must
    not corrupt the checkpoint, and the `last` alias must appear once committed."""
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager

    state = task.init_state()
    orig = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(state.params)]
    mgr = CheckpointManager(str(tmp_path / "ckpt"), every_n_steps=2, keep=2)
    mgr.save(state, 2, blocking=False)
    # reuse the saved buffers immediately, as the donating train loop does
    state, _ = task.train_step(state, 0)
    restored = mgr.restore(task.init_state())  # wait() commits the pending save
    assert (tmp_path / "ckpt" / "last").read_text() == "step_000000000002"
    for a, b in zip(orig, jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.slow
def test_train_determinism(task):
    """Same seed + same batch stream ⇒ identical loss sequence (the reference's
    seed_everything/deterministic=True contract)."""
    losses = []
    for _ in range(2):
        state = task.init_state()
        seq = []
        for i in range(3):
            state, m = task.train_step(state, 100 + i)
            seq.append(float(m["vicreg/train/loss"]))
        losses.append(seq)
    assert losses[0] == losses[1]


def test_noise_buffer_not_baked_into_hlo(task):
    """The cached fixed-seed noise buffer must enter the jitted train step as a
    runtime ARGUMENT — a closure would bake it into the lowered module as a literal
    constant ([1024, 176400] fp32 = 722 MB at the reference's b1024, breaking the
    remote-compile request limit; this regression shipped once as HTTP 413)."""
    import re

    state = task.init_state()
    txt = task._train_step_jit.lower(state, 0, task._noise).as_text()
    b, t = task._noise.shape
    shape = f"{b}x{t}"
    pattern = rf"(stablehlo\.constant|dense_resource)[^\n]*tensor<{shape}x"
    assert not re.findall(pattern, txt), (
        f"noise-buffer-shaped literal constant found in the lowered train step "
        f"(shape [{b}, {t}])"
    )
    # the noise must still be IN the program — as a function argument
    assert re.search(rf"tensor<{shape}xf32>", txt), "noise argument missing"

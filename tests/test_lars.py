"""LARS parity: fused_lars reproduces lightning-flash's LARS update rule EXACTLY
(flash/core/optimizers/lars.py, zero momentum — the way the reference calls it:
vicreg_audio_params.py:134-142): with weight decay, local_lr = tc·||w|| / (||g|| +
wd·||w|| + eps) and d_p = (g + wd·w)·local_lr, gated on both norms nonzero; with
wd == 0 (or a failed norm gate) flash applies NO trust scaling and NO decay —
plain SGD."""

import numpy as np
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.train.optim import make_optimizer


def flash_lars_update(w, g, lr, weight_decay, trust_coefficient=0.001, eps=1e-8):
    # transcription of flash/core/optimizers/lars.py step() (momentum=0)
    d_p = g
    if weight_decay != 0:
        w_norm = np.linalg.norm(w)
        g_norm = np.linalg.norm(g)
        if w_norm != 0 and g_norm != 0:
            local_lr = trust_coefficient * w_norm / (g_norm + w_norm * weight_decay + eps)
            d_p = (g + weight_decay * w) * local_lr
    return -lr * d_p


def test_lars_matches_flash_formula():
    rng = np.random.RandomState(0)
    w = rng.randn(16, 8).astype(np.float32)
    g = rng.randn(16, 8).astype(np.float32) * 0.1

    batch_size = 64
    base_lr = 2.0
    wd = 1e-6
    tx, schedule = make_optimizer(
        {"name": "lars", "args": {"base_lr": base_lr, "weight_decay": wd}}, batch_size
    )
    params = {"w": jnp.asarray(w)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, state, params)

    lr = batch_size / 256.0 * base_lr
    expected = flash_lars_update(w, g, lr, wd)
    np.testing.assert_allclose(np.asarray(updates["w"]), expected, rtol=1e-4, atol=1e-7)


def test_lars_exclude_bias_and_norm():
    """Opt-in masking (the reference's unused exclude_bias_and_norm helper,
    vicreg.py:98-99): 1-D params get plain SGD, ≥2-D params the full LARS update."""
    rng = np.random.RandomState(1)
    w = rng.randn(16, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    gw = rng.randn(16, 8).astype(np.float32) * 0.1
    gb = rng.randn(8).astype(np.float32) * 0.1

    batch_size, base_lr, wd = 64, 2.0, 1e-6
    tx, _ = make_optimizer(
        {
            "name": "lars",
            "args": {
                "base_lr": base_lr,
                "weight_decay": wd,
                "exclude_bias_and_norm": True,
            },
        },
        batch_size,
    )
    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, state, params)

    lr = batch_size / 256.0 * base_lr
    np.testing.assert_allclose(
        np.asarray(updates["w"]), flash_lars_update(w, gw, lr, wd), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(updates["b"]), -lr * gb, rtol=1e-6)


def test_scheduler_step_every_nbatches():
    """Downstream LR cadence: the schedule advances once per N optimizer steps
    (reference: audio_to_params.py:280-284 steps every 10,000 batches)."""
    from inverse_audio_synthesis_tpu.train.optim import make_schedule

    cfg = {
        "name": "LinearWarmupCosineAnnealingLR",
        "step_every_nbatches": 100,
        "args": {"warmup_epochs": 5, "max_epochs": 50, "eta_min": 0.0},
    }
    sched = make_schedule(cfg, peak_lr=1.0)
    # constant within a 100-step window, advances across windows
    assert float(sched(0)) == float(sched(99))
    assert float(sched(100)) != float(sched(0))
    base = make_schedule({**cfg, "step_every_nbatches": 1}, peak_lr=1.0)
    assert float(sched(250)) == float(base(2))


def test_nonfinite_updates_rejected_and_counted():
    """reject_nonfinite_updates guard: a NaN gradient produces a ZERO update (no poisoned
    step) and increments the device-side counter the Trainer raises on."""
    from inverse_audio_synthesis_tpu.train.optim import total_notfinite

    tx, _ = make_optimizer(
        {"name": "lars", "args": {"base_lr": 2.0, "weight_decay": 0.0}}, 256
    )
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    assert int(total_notfinite(state)) == 0

    bad = {"w": jnp.asarray([1.0, jnp.nan, 0.0, 0.0])}
    updates, state = tx.update(bad, state, params)
    np.testing.assert_array_equal(np.asarray(updates["w"]), 0.0)
    assert int(total_notfinite(state)) == 1

    good = {"w": jnp.asarray([0.1, 0.1, 0.1, 0.1])}
    updates, state = tx.update(good, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0  # recovers after a bad step
    assert int(total_notfinite(state)) == 1


def test_lars_weight_decay_applied():
    rng = np.random.RandomState(2)
    w = np.ones((4, 4), np.float32)
    g = rng.randn(4, 4).astype(np.float32) * 0.01
    tx, _ = make_optimizer(
        {"name": "lars", "args": {"base_lr": 2.0, "weight_decay": 0.1}}, 256
    )
    params = {"w": jnp.asarray(w)}
    state = tx.init(params)
    upd, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    lr = 256 / 256.0 * 2.0
    expected = flash_lars_update(w, g, lr, 0.1)
    np.testing.assert_allclose(np.asarray(upd["w"]), expected, rtol=1e-4, atol=1e-7)
    # decay direction present: differs from the plain-SGD update
    assert float(jnp.abs(upd["w"] - (-lr * jnp.asarray(g))).max()) > 0


def test_lars_zero_grad_matches_flash_no_op():
    """flash's norm gate: with a zero gradient (g_norm == 0) the update is exactly
    zero — no decay is applied outside the gate (flash/core/optimizers/lars.py)."""
    tx, _ = make_optimizer(
        {"name": "lars", "args": {"base_lr": 2.0, "weight_decay": 0.1}}, 256
    )
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    upd, _ = tx.update({"w": jnp.zeros((4, 4))}, state, params)
    np.testing.assert_array_equal(np.asarray(upd["w"]), 0.0)

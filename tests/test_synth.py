"""Voice synthesizer: spec table, determinism, DSP behavior, torchsynth API surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.synth import (
    SynthConfig,
    Voice,
    VOICE_PARAM_SPECS,
    from_0to1,
    to_0to1,
)
from inverse_audio_synthesis_tpu.synth import modules
from inverse_audio_synthesis_tpu.synth.voice import (
    is_train_split,
    render_voice,
    sample_voice_params,
)

CFG = SynthConfig(batch_size=4, buffer_size_seconds=1.0)


def test_spec_table():
    assert len(VOICE_PARAM_SPECS) == 78  # reference: conf/config.yaml:27
    names = [(s.module, s.name) for s in VOICE_PARAM_SPECS]
    assert names[0] == ("keyboard", "midi_f0")
    assert names[1] == ("keyboard", "duration")
    assert names[2] == ("adsr_1", "attack")
    assert ("mod_matrix", "adsr_1->vco_1_pitch") in names
    assert ("mod_matrix", "lfo_2->noise_amp") in names
    assert names[-3:] == [("mixer", "vco_1"), ("mixer", "vco_2"), ("mixer", "noise")]
    assert len(set(names)) == 78  # unique


def test_param_range_roundtrip():
    x = jnp.linspace(0.01, 0.99, 23)
    for spec in VOICE_PARAM_SPECS:
        v = from_0to1(spec, x)
        assert float(v.min()) >= spec.minimum - 1e-4
        assert float(v.max()) <= spec.maximum + 1e-4
        x2 = to_0to1(spec, v)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_sample_determinism_and_batch_invariance():
    p1 = sample_voice_params(123, CFG)
    p2 = sample_voice_params(123, CFG)
    p3 = sample_voice_params(124, CFG)
    assert p1.shape == (4, 78)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert np.abs(np.asarray(p1) - np.asarray(p3)).max() > 0.01
    assert float(p1.min()) >= 0.0 and float(p1.max()) <= 1.0


def test_render_deterministic_and_finite():
    p = sample_voice_params(7, CFG)
    a1 = render_voice(p, CFG)
    a2 = render_voice(p, CFG)
    assert a1.shape == (4, CFG.buffer_size)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.isfinite(np.asarray(a1)).all()
    # mod matrix can route up to 4 unit envelopes into one amp (unnormalized, like
    # torchsynth); with 3 mixer channels the theoretical bound is ~16
    assert float(jnp.abs(a1).max()) < 16.0


def test_adsr_envelope_shape():
    cr, tc = 100.0, 400  # 4 seconds at 100 Hz control rate
    params = {
        "attack": jnp.array([0.5]),
        "decay": jnp.array([0.5]),
        "sustain": jnp.array([0.4]),
        "release": jnp.array([1.0]),
        "alpha": jnp.array([1.0]),
    }
    env = np.asarray(
        modules.adsr_envelope(params, jnp.array([2.0]), tc, cr)
    )[0]
    assert env[0] == pytest.approx(0.0, abs=1e-6)
    assert env[50] == pytest.approx(1.0, abs=0.03)  # end of attack (0.5 s)
    assert env[100] == pytest.approx(0.4, abs=0.03)  # sustain after decay
    assert env[190] == pytest.approx(0.4, abs=0.03)  # held at sustain
    assert env[299] == pytest.approx(0.0, abs=0.02)  # released (2 s + 1 s)
    assert env[399] == pytest.approx(0.0, abs=1e-6)


def test_adsr_zero_attack_is_instant():
    cr, tc = 100.0, 100
    params = {
        "attack": jnp.array([0.0]),
        "decay": jnp.array([10.0]),
        "sustain": jnp.array([1.0]),
        "release": jnp.array([5.0]),
        "alpha": jnp.array([1.0]),
    }
    env = np.asarray(modules.adsr_envelope(params, jnp.array([1.0]), tc, cr))[0]
    assert env[1] == pytest.approx(1.0, abs=1e-5)
    assert np.isfinite(env).all()


def test_lfo_frequency():
    cr, tc = 441.0, 4410  # 10 s
    params = {
        "frequency": jnp.array([2.0]),
        "mod_depth": jnp.array([0.0]),
        "initial_phase": jnp.array([0.0]),
        "sin": jnp.array([1.0]),
        "tri": jnp.array([0.0]),
        "saw": jnp.array([0.0]),
        "rsaw": jnp.array([0.0]),
        "sqr": jnp.array([0.0]),
    }
    sig = np.asarray(modules.lfo(params, jnp.zeros((1, tc)), cr))[0]
    assert sig.min() >= 0.0 and sig.max() <= 1.0
    # count rising crossings of 0.5 → ~2 Hz over 10 s ⇒ ~20 cycles
    crossings = np.sum((sig[:-1] < 0.5) & (sig[1:] >= 0.5))
    assert 18 <= crossings <= 22


def test_sine_vco_pitch():
    sr, ta = 44100.0, 44100
    params = {
        "tuning": jnp.array([0.0]),
        "mod_depth": jnp.array([0.0]),
        "initial_phase": jnp.array([0.0]),
    }
    sig = np.asarray(
        modules.sine_vco(params, jnp.array([69.0]), jnp.zeros((1, ta)), sr)
    )[0]
    spec = np.abs(np.fft.rfft(sig))
    freq = np.fft.rfftfreq(ta, 1 / sr)[np.argmax(spec)]
    assert freq == pytest.approx(440.0, abs=1.5)  # midi 69 = A440


def test_square_saw_morph():
    sr, ta = 44100.0, 4410
    base = {
        "tuning": jnp.array([0.0]),
        "mod_depth": jnp.array([0.0]),
        "initial_phase": jnp.array([0.0]),
    }
    sq = np.asarray(
        modules.square_saw_vco(
            {**base, "shape": jnp.array([0.0])}, jnp.array([60.0]), jnp.zeros((1, ta)), sr
        )
    )[0]
    saw = np.asarray(
        modules.square_saw_vco(
            {**base, "shape": jnp.array([1.0])}, jnp.array([60.0]), jnp.zeros((1, ta)), sr
        )
    )[0]
    assert np.isfinite(sq).all() and np.isfinite(saw).all()
    # square is symmetric (odd harmonics): near-zero even-harmonic energy vs saw
    assert np.abs(sq).max() <= 1.01
    assert not np.allclose(sq, saw)


def test_noise_fixed_and_batch_invariant():
    key = jax.random.PRNGKey(13)
    n1 = modules.noise(key, 2, 1000)
    n2 = modules.noise(key, 4, 1000)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2)[:2])
    assert float(n1.min()) >= -1.0 and float(n1.max()) <= 1.0
    # row_offset reproduces rows offset..offset+B of the un-chunked buffer — the
    # contract retrieval's inner scan relies on so a params-identical candidate
    # at global row j reproduces query row j's noise exactly (eval/retrieval.py)
    tail = modules.noise(key, 2, 1000, row_offset=2)
    np.testing.assert_array_equal(np.asarray(tail), np.asarray(n2)[2:])
    traced = modules.noise(key, 2, 1000, row_offset=jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(traced), np.asarray(n2)[2:])


def test_upsample_linear():
    x = jnp.array([[0.0, 1.0, 0.0]])
    y = np.asarray(modules.upsample_control(x, 9))
    assert y.shape == (1, 9)
    assert y.max() <= 1.0 + 1e-6 and y.min() >= -1e-6


def test_voice_call_surface():
    voice = Voice(CFG)
    audio, params, is_train = voice(42)
    assert audio.shape == (4, CFG.buffer_size)
    assert params.shape == (4, 78)
    assert is_train.shape == (4,)
    audio2, params2, _ = voice(42)
    np.testing.assert_array_equal(np.asarray(audio), np.asarray(audio2))

    # torchsynth-style write-back + resynthesis (reference: audio_to_params.py:240-257)
    predicted = jnp.clip(params + 0.01, 0.0, 1.0)
    for (module, name), value in zip(voice.get_parameters().keys(), predicted.T):
        voice.set_parameter_0to1(module, name, value)
    voice.freeze_parameters(voice.get_parameters().keys())
    audio3, params3, _ = voice(None)
    voice.unfreeze_all_parameters()
    np.testing.assert_allclose(np.asarray(params3), np.asarray(predicted), atol=1e-7)
    # resynthesis from written-back params is exactly render(predicted) (same jitted fn)
    resynth = voice._render(predicted)
    np.testing.assert_array_equal(np.asarray(audio3), np.asarray(resynth))


def test_freeze_parameters_subset():
    """Per-key freeze (torchsynth surface): frozen params survive a resampling
    ``voice(batch_num)`` call; all others are freshly drawn."""
    voice = Voice(CFG)
    _, params, _ = voice(7)
    frozen_keys = list(voice.get_parameters().keys())[:5]
    frozen_idx = [i for i, k in enumerate(voice.get_parameters().keys()) if k in frozen_keys]
    voice.freeze_parameters(frozen_keys)
    _, params2, _ = voice(8)
    p1, p2 = np.asarray(params), np.asarray(params2)
    np.testing.assert_array_equal(p1[:, frozen_idx], p2[:, frozen_idx])
    free_idx = [i for i in range(p1.shape[1]) if i not in frozen_idx]
    assert not np.array_equal(p1[:, free_idx], p2[:, free_idx])
    # repeated calls accumulate frozen keys
    more = list(voice.get_parameters().keys())[5:8]
    voice.freeze_parameters(more)
    _, params3, _ = voice(9)
    np.testing.assert_array_equal(
        np.asarray(params3)[:, :8], p2[:, :8]
    )
    voice.unfreeze_all_parameters()
    _, params4, _ = voice(10)
    assert not np.array_equal(np.asarray(params4)[:, :5], p1[:, :5])


def test_is_train_split():
    """synth1B1 rule: every 10th BATCH is test; the flag is batch-level."""
    cfg = SynthConfig(batch_size=20)
    assert not np.asarray(is_train_split(0, cfg)).any()  # batch 0 → test
    assert np.asarray(is_train_split(1, cfg)).all()
    assert np.asarray(is_train_split(9, cfg)).all()
    assert not np.asarray(is_train_split(10, cfg)).any()
    # 10% of batches are test overall
    frac = np.mean([bool(is_train_split(n, cfg)[0]) for n in range(100)])
    assert frac == 0.9


@pytest.mark.slow
def test_render_jit_and_grad():
    p = sample_voice_params(3, CFG)
    f = jax.jit(lambda q: render_voice(q, CFG))
    a = f(p)
    assert a.shape == (4, CFG.buffer_size)

    # differentiable end-to-end (enables "backprop through the synth", which the
    # reference only sketched in a comment — audio_to_params.py:56-174)
    def loss(q):
        return jnp.mean(render_voice(q, CFG) ** 2)

    g = jax.grad(loss)(p)
    assert g.shape == p.shape
    assert np.isfinite(np.asarray(g)).all()


def test_batch_size_invariant_voices():
    """Row r of batch_num is identical at any batch size (threefry counter-mode
    prefix property + per-row noise keying). Consequence: a batch number denotes the
    same underlying voices regardless of task batch size, so train/test membership is
    batch-size independent — fixing the reference's acknowledged split-leak worry
    (runsetup.py:24-27: vicreg batch 128 vs downstream batch 4)."""
    a = sample_voice_params(7, SynthConfig(batch_size=4, buffer_size_seconds=1.0))
    b = sample_voice_params(7, SynthConfig(batch_size=16, buffer_size_seconds=1.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:4])
    ra = render_voice(a, SynthConfig(batch_size=4, buffer_size_seconds=1.0))
    rb = render_voice(b, SynthConfig(batch_size=16, buffer_size_seconds=1.0))
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb)[:4], atol=1e-5)


def test_adsr_zero_decay_holds_sustain():
    """Regression: with attack >= note duration, decay clips to 0 — the envelope must
    sit at sustain after the (clipped) attack, not invert (code-review finding)."""
    cr, tc = 100.0, 300
    params = {
        "attack": jnp.array([2.0]),   # longer than the 1 s note → decay duration 0
        "decay": jnp.array([1.0]),
        "sustain": jnp.array([0.25]),
        "release": jnp.array([0.5]),
        "alpha": jnp.array([1.0]),
    }
    env = np.asarray(modules.adsr_envelope(params, jnp.array([1.0]), tc, cr))[0]
    # attack clipped to the 1 s note ramps 0→1; the zero-length decay then drops
    # instantly to sustain as release begins — before the fix the decay factor was
    # inverted (0 during attack, 1 after), scaling the whole attack by sustain
    assert env[0] == pytest.approx(0.0, abs=1e-6)
    assert env[99] == pytest.approx(0.99, abs=0.02)   # attack nearly complete, NOT ×0.25
    assert env[101] == pytest.approx(0.245, abs=0.02)  # sustain × release onset
    assert env[151] == pytest.approx(0.0, abs=1e-6)    # fully released (1 s + 0.5 s)


def test_from_0to1_grad_finite_at_zero():
    """Safe-power gradients at exactly 0/1 for curve-warped params (code-review)."""
    spec = next(s for s in VOICE_PARAM_SPECS if s.curve == 0.5 and not s.symmetric)
    g = jax.grad(lambda x: from_0to1(spec, x))(jnp.float32(0.0))
    assert np.isfinite(float(g))


def test_torchsynth_parity_probes_consistent():
    """The committed parity probes (tools/torchsynth_parity.py export) must stay
    in sync with the live synth: same registration table, same params01 →
    natural mapping, same rendered audio (f16-quantized) for the batch0 probe."""
    import json
    from pathlib import Path

    import numpy as np

    from inverse_audio_synthesis_tpu.synth import SynthConfig
    from inverse_audio_synthesis_tpu.synth.parameter import from_0to1
    from inverse_audio_synthesis_tpu.synth.voice import (
        VOICE_PARAM_SPECS,
        render_voice,
        sample_voice_params,
    )

    probes = Path(__file__).parent / "golden" / "torchsynth_probes"
    reg = json.loads((probes / "registration.json").read_text())
    assert reg["nparams"] == len(VOICE_PARAM_SPECS)
    for spec, row in zip(VOICE_PARAM_SPECS, reg["specs"]):
        assert (spec.module, spec.name) == (row["module"], row["name"])
        assert (spec.minimum, spec.maximum, spec.curve, spec.symmetric) == (
            row["minimum"], row["maximum"], row["curve"], row["symmetric"],
        )

    d = np.load(probes / "probe_batch0.npz")
    cfg = SynthConfig(
        batch_size=d["params01"].shape[0],
        sample_rate=reg["sample_rate"],
        buffer_size_seconds=reg["buffer_size_seconds"],
    )
    params01 = sample_voice_params(0, cfg)
    np.testing.assert_allclose(np.asarray(params01), d["params01"], atol=1e-7)
    nat = np.stack(
        [
            np.asarray(from_0to1(s, params01[:, i]))
            for i, s in enumerate(VOICE_PARAM_SPECS)
        ],
        axis=1,
    )
    np.testing.assert_allclose(nat, d["natural"], rtol=1e-5, atol=1e-5)
    audio = np.asarray(render_voice(params01, cfg))
    assert np.abs(audio.astype(np.float16).astype(np.float32) - d["audio"]).max() < 2e-3


def test_torchsynth_parity_log_mel():
    """The compare half's numpy log-mel (no torchaudio in a compare env) is
    sane: zero distance to itself, sensitive to different audio."""
    import numpy as np

    from tools.torchsynth_parity import _log_mel

    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 44100)).astype(np.float32)
    b = rng.standard_normal((2, 44100)).astype(np.float32)
    ma, mb = _log_mel(a, 44100), _log_mel(b, 44100)
    assert np.isfinite(ma).all()
    assert np.abs(ma - _log_mel(a, 44100)).max() == 0.0
    assert np.abs(ma - mb).mean() > 0.01

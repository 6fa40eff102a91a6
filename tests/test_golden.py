"""Golden regression values for the synth: pins the seed→params→audio contract so any
accidental semantic change (param table order, curve warps, DSP math, PRNG keying)
fails loudly. Values recorded from the CPU fp32 jnp path (2026-08-17, after the
switch to the cross-backend-reproducible exp2 in ops/math_ops.py and the
pad-to-chunk fix in phase_cumsum — non-divisible buffer lengths now take the
2π-wrapped chunked path instead of an unwrapped cumsum)."""

import numpy as np

import jax.numpy as jnp

from inverse_audio_synthesis_tpu.synth import SynthConfig
from inverse_audio_synthesis_tpu.synth.voice import render_voice, sample_voice_params

CFG = SynthConfig(batch_size=2, buffer_size_seconds=1.0)

GOLDEN_PARAMS_ROW0_HEAD = [
    0.9268351793289185,
    0.4362906217575073,
    0.5545579195022583,
    0.44604945182800293,
    0.6956034898757935,
    0.8668047189712524,
]
GOLDEN_AUDIO_ROW0_22050 = [
    0.9945648908615112,
    0.6705565452575684,
    -0.6919518709182739,
    -0.2617585062980652,
    0.45507749915122986,
    -0.2646327018737793,
]
GOLDEN_RMS = [0.6319276690483093, 0.653509259223938]


def test_golden_params():
    p = np.asarray(sample_voice_params(1234, CFG))
    np.testing.assert_allclose(p[0, :6], GOLDEN_PARAMS_ROW0_HEAD, atol=1e-6)


def test_golden_artifact():
    """Committed golden artifact (tests/golden/voice_batch1234.npz, CPU fp32,
    2026-08-17): pins the full 78-param draw and the rendered waveform for batch
    1234 at batch_size=4 across refactors — the WAV-golden analog of torchsynth's
    reproducibility contract (synth1B1 canonical batches)."""
    from pathlib import Path

    blob = np.load(Path(__file__).parent / "golden" / "voice_batch1234.npz")
    cfg = SynthConfig(batch_size=4, buffer_size_seconds=1.0)
    p = np.asarray(sample_voice_params(1234, cfg))
    np.testing.assert_allclose(p, blob["params01"], atol=1e-6)
    a = np.asarray(render_voice(sample_voice_params(1234, cfg), cfg))
    np.testing.assert_allclose(a[:, :4096], blob["audio_head"], atol=2e-3)
    np.testing.assert_allclose(a[:, -1024:], blob["audio_tail"], atol=2e-3)
    rms = np.sqrt((a**2).mean(axis=1))
    np.testing.assert_allclose(rms, blob["audio_rms"], rtol=1e-3)


def test_golden_audio():
    p = sample_voice_params(1234, CFG)
    a = np.asarray(render_voice(p, CFG))
    np.testing.assert_allclose(
        a[0, 22050:22056], GOLDEN_AUDIO_ROW0_22050, atol=2e-3
    )
    rms = [float(np.sqrt((a[i] ** 2).mean())) for i in range(2)]
    np.testing.assert_allclose(rms, GOLDEN_RMS, rtol=1e-3)

"""Fused Pallas render kernel vs the jnp path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.synth import SynthConfig
from inverse_audio_synthesis_tpu.synth.voice import (
    fused_render_available,
    render_voice,
    render_voice_fused,
    sample_voice_params,
)

# 1.0 s: Tc = 441, Ta = 44100 — exact ratio 100 like the full config
CFG = SynthConfig(batch_size=4, buffer_size_seconds=1.0)


def test_geometry_gate():
    assert fused_render_available(CFG)
    assert fused_render_available(SynthConfig(batch_size=1))  # 4 s full config
    # tiny test config with non-integer ratio falls back
    assert not fused_render_available(
        SynthConfig(batch_size=1, buffer_size_seconds=3 * 64 * 64 / 44100)
    )


def test_fused_matches_jnp():
    params = sample_voice_params(42, CFG)
    ref = np.asarray(render_voice(params, CFG))
    fused = np.asarray(render_voice_fused(params, CFG, True))
    assert fused.shape == ref.shape
    # phase integration orders differ (segment-level vs 128-chunk); at fp32 the
    # accumulated phase rounding shows up as small waveform jitter
    err = np.abs(fused - ref)
    assert np.isfinite(fused).all()
    assert err.max() < 0.08, err.max()
    rms = np.sqrt(np.mean((fused - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-9)
    assert rms < 0.01, rms


def test_fused_batch_padding():
    cfg = SynthConfig(batch_size=3, buffer_size_seconds=1.0)  # pads 3 → 8
    params = sample_voice_params(7, cfg)
    ref = np.asarray(render_voice(params, cfg))
    fused = np.asarray(render_voice_fused(params, cfg, True))
    assert fused.shape == ref.shape
    assert np.abs(fused - ref).max() < 0.08


def test_fused_grad_uses_jnp_vjp():
    params = sample_voice_params(3, CFG)

    def loss(q):
        return jnp.mean(render_voice_fused(q, CFG, True) ** 2)

    g = np.asarray(jax.grad(loss)(params))
    g_ref = np.asarray(jax.grad(lambda q: jnp.mean(render_voice(q, CFG) ** 2))(params))
    assert np.isfinite(g).all()
    # the cotangent flows from the fused forward (which differs from the jnp forward
    # by phase-rounding jitter), so compare directionally rather than elementwise
    denom = np.linalg.norm(g) * np.linalg.norm(g_ref) + 1e-12
    cosine = float(np.sum(g * g_ref) / denom)
    assert cosine > 0.99, cosine
    rel_l2 = np.linalg.norm(g - g_ref) / (np.linalg.norm(g_ref) + 1e-12)
    assert rel_l2 < 0.3, rel_l2  # phase-sensitive elements jitter; direction is what matters

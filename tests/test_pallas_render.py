"""Fused Pallas render kernel vs the jnp path (interpret mode on CPU)."""

import pytest
import numpy as np
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


def test_fused_with_custom_noise_matches_jnp():
    """render_fused_with_noise (retrieval's candidate-stream path: caller-keyed
    noise buffer, no custom VJP) must match render_voice with the same noise."""
    import jax

    from inverse_audio_synthesis_tpu.synth import modules
    from inverse_audio_synthesis_tpu.synth.voice import render_fused_with_noise

    cfg = SynthConfig(batch_size=4, buffer_size_seconds=1.0)
    params = sample_voice_params(13, cfg)
    noise = modules.noise(jax.random.PRNGKey(999), 4, cfg.buffer_size)
    ref = np.asarray(render_voice(params, cfg, noise=noise))
    fused = np.asarray(render_fused_with_noise(params, cfg, noise, interpret=True))
    assert fused.shape == ref.shape
    assert np.abs(fused - ref).max() < 0.08
    # and the noise actually matters: default-noise render differs
    assert np.abs(ref - np.asarray(render_voice(params, cfg))).max() > 1e-3


def test_fused_batch_padding():
    cfg = SynthConfig(batch_size=3, buffer_size_seconds=1.0)  # pads 3 → 8
    params = sample_voice_params(7, cfg)
    ref = np.asarray(render_voice(params, cfg))
    fused = np.asarray(render_voice_fused(params, cfg, True))
    assert fused.shape == ref.shape
    assert np.abs(fused - ref).max() < 0.08


@pytest.mark.slow
def test_fused_shard_map_data8_matches_jnp():
    """Under a data=8 mesh the fused render runs one kernel instance per shard via
    shard_map; noise rows are keyed by GLOBAL row index so shards must not repeat
    each other, and the sharded result must equal both the jnp path and the
    unsharded fused path (bitwise — same kernel, same per-row inputs)."""
    from inverse_audio_synthesis_tpu.parallel.mesh import batch_sharding, create_mesh

    cfg = SynthConfig(batch_size=16, buffer_size_seconds=1.0)
    mesh = create_mesh(data=8, model=1)
    params = sample_voice_params(11, cfg)
    params = jax.device_put(params, batch_sharding(mesh))

    fused_sharded = jax.jit(lambda p: render_voice_fused(p, cfg, True, mesh))(params)
    assert len(fused_sharded.sharding.device_set) == 8
    fused_sharded = np.asarray(fused_sharded)
    # vs the jnp path (which uses globally-keyed noise): duplicated noise rows across
    # shards would blow way past this tolerance on noise-dominated voices
    ref = np.asarray(render_voice(params, cfg))
    assert np.abs(fused_sharded - ref).max() < 0.08
    # vs the unsharded fused path: same kernel, same per-row inputs (tiny fp
    # differences from XLA fusion order in the control-rate program are expected)
    fused_single = np.asarray(render_voice_fused(params, cfg, True))
    np.testing.assert_allclose(fused_sharded, fused_single, atol=0.02)


@pytest.mark.slow
def test_fused_shard_map_grad_finite():
    """jax.grad flows through the shard_mapped fused render (custom VJP = jnp path)."""
    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh

    cfg = SynthConfig(batch_size=8, buffer_size_seconds=1.0)
    mesh = create_mesh(data=8, model=1)
    params = sample_voice_params(5, cfg)
    cot = jax.random.normal(jax.random.PRNGKey(0), (cfg.batch_size, cfg.buffer_size))
    _, vjp_sharded = jax.vjp(lambda q: render_voice_fused(q, cfg, True, mesh), params)
    _, vjp_jnp = jax.vjp(lambda q: render_voice(q, cfg), params)
    g = np.asarray(vjp_sharded(cot)[0])
    assert np.isfinite(g).all()
    # the fused backward IS the jnp VJP, sharded or not — identical given one cotangent
    np.testing.assert_allclose(g, np.asarray(vjp_jnp(cot)[0]), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_grad_uses_jnp_vjp():
    """The fused kernel's backward IS the jnp path's VJP: with an identical cotangent
    both must produce identical gradients. (Comparing jax.grad of the two losses is
    ill-conditioned: ∂cos(ωt)/∂ω has amplitude t ≈ 4e4, so the tiny forward phase
    jitter between implementations decorrelates pitch-parameter grads by design.)"""
    params = sample_voice_params(3, CFG)
    cot = jax.random.normal(jax.random.PRNGKey(0), (CFG.batch_size, CFG.buffer_size))

    _, vjp_fused = jax.vjp(lambda q: render_voice_fused(q, CFG, True), params)
    _, vjp_jnp = jax.vjp(lambda q: render_voice(q, CFG), params)
    g = np.asarray(vjp_fused(cot)[0])
    g_ref = np.asarray(vjp_jnp(cot)[0])
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-5)

    # and jax.grad through the fused loss is finite end-to-end
    gl = jax.grad(lambda q: jnp.mean(render_voice_fused(q, CFG, True) ** 2))(params)
    assert np.isfinite(np.asarray(gl)).all()


def test_cached_noise_buffer_bit_identical():
    """A pre-generated fixed-seed buffer (train/pretrain.make_render_fn's cache)
    must reproduce the internal-generation path BIT-identically, including the
    leading-slice case (a caller rendering a sub-batch, e.g. the downstream mel
    chunk, against a full-batch cache)."""
    from inverse_audio_synthesis_tpu.synth import modules

    cfg = SynthConfig(batch_size=4, buffer_size_seconds=1.0)
    params = sample_voice_params(21, cfg)
    cache8 = modules.noise(jax.random.PRNGKey(cfg.noise_seed), 8, cfg.buffer_size)
    internal = np.asarray(render_voice_fused(params, cfg, True))
    cached = np.asarray(render_voice_fused(params, cfg, True, None, cache8))
    np.testing.assert_array_equal(internal, cached)
    # jnp path too
    ref_internal = np.asarray(render_voice(params, cfg))
    ref_cached = np.asarray(render_voice(params, cfg, noise=cache8[:4]))
    np.testing.assert_array_equal(ref_internal, ref_cached)


def test_cached_noise_grad_matches_and_drops_noise_cotangent():
    """Gradients through the provided-noise fused path equal the internal path's,
    and differentiating w.r.t. params only (the production shape: noise is a fixed
    buffer) works under jit."""
    from inverse_audio_synthesis_tpu.synth import modules

    cfg = SynthConfig(batch_size=4, buffer_size_seconds=1.0)
    params = sample_voice_params(2, cfg)
    noise = modules.noise(jax.random.PRNGKey(cfg.noise_seed), 4, cfg.buffer_size)
    cot = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.buffer_size))
    _, vjp_cached = jax.vjp(
        lambda q: render_voice_fused(q, cfg, True, None, noise), params
    )
    _, vjp_internal = jax.vjp(lambda q: render_voice_fused(q, cfg, True), params)
    np.testing.assert_array_equal(
        np.asarray(vjp_cached(cot)[0]), np.asarray(vjp_internal(cot)[0])
    )

    g = jax.jit(
        jax.grad(lambda q: jnp.mean(render_voice_fused(q, cfg, True, None, noise) ** 2))
    )(params)
    assert np.isfinite(np.asarray(g)).all()

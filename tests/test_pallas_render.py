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
    """jax.grad flows through the shard_mapped fused render with bwd="jnp"
    (the legacy escape hatch whose backward IS the jnp path's VJP)."""
    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh

    cfg = SynthConfig(batch_size=8, buffer_size_seconds=1.0)
    mesh = create_mesh(data=8, model=1)
    params = sample_voice_params(5, cfg)
    cot = jax.random.normal(jax.random.PRNGKey(0), (cfg.batch_size, cfg.buffer_size))
    _, vjp_sharded = jax.vjp(
        lambda q: render_voice_fused(q, cfg, True, mesh, bwd="jnp"), params
    )
    _, vjp_jnp = jax.vjp(lambda q: render_voice(q, cfg), params)
    g = np.asarray(vjp_sharded(cot)[0])
    assert np.isfinite(g).all()
    # the fused backward IS the jnp VJP, sharded or not — identical given one cotangent
    np.testing.assert_allclose(g, np.asarray(vjp_jnp(cot)[0]), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_grad_uses_jnp_vjp():
    """bwd="jnp" (the legacy escape hatch): the backward IS the jnp path's VJP —
    with an identical cotangent both must produce identical gradients. (Comparing
    jax.grad of the two losses is ill-conditioned: ∂cos(ωt)/∂ω has amplitude
    t ≈ 4e4, so the tiny forward phase jitter between implementations
    decorrelates pitch-parameter grads by design. The default bwd="pallas" is
    pinned against the replica oracle below instead.)"""
    params = sample_voice_params(3, CFG)
    cot = jax.random.normal(jax.random.PRNGKey(0), (CFG.batch_size, CFG.buffer_size))

    _, vjp_fused = jax.vjp(
        lambda q: render_voice_fused(q, CFG, True, bwd="jnp"), params
    )
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


# ---------------------------------------------------------------------------
# Pallas backward kernel (round 5): oracle = jnp replica of the kernel's exact
# block-wise math (same helpers, same association), differentiated by autodiff.
# ---------------------------------------------------------------------------


def _kernel_replica(routed, scalars, noise, sample_rate):
    """Pure-jnp replica of the fused kernel's audio-rate math, built from the
    SAME block helpers (_integrate_block/_upsampled/_build_windows), looped over
    time blocks in python. jax.grad of this is the ground truth for the
    hand-derived backward kernel: the two differ only by float association in
    the derivative chains, not by trajectory (unlike render_voice, whose
    128-chunk phase association diverges from the kernel's segment blocks by
    ~1e-2 in ill-conditioned pitch-gradient directions)."""
    from inverse_audio_synthesis_tpu.ops.math_ops import (
        cos_fast,
        sincos_fast,
        tanh_fast,
    )
    from inverse_audio_synthesis_tpu.ops.pallas import render as R

    b, _, tc = routed.shape
    ta = noise.shape[-1]
    ratio = ta // tc
    s, tc_p, ta_p, n_blocks = R._geometry(tc, ta)
    noise_p = jnp.concatenate(
        [noise, jnp.zeros((b, ta_p - ta))], -1
    ).reshape(b, tc_p, ratio)
    windows = R._build_windows(routed, tc_p, s)
    w, use_prev = R._interp_weights(ratio)
    two_pi = 2.0 * jnp.pi
    carry = [jnp.zeros((b,)), jnp.zeros((b,))]
    outs = []
    for t in range(n_blocks):
        window = windows[:, t]

        def up(sig):
            return R._upsampled(window, sig, s, w, use_prev)

        def col(i):
            return scalars[:, i][:, None, None]

        ph1, _, _, inc1 = R._integrate_block(
            up(0), col(0), col(1), carry[0], s=s, r=ratio, bt=b,
            sample_rate=sample_rate,
        )
        carry[0] = jnp.mod(carry[0] + inc1, two_pi)
        mix = col(8) * cos_fast(ph1 + col(2)) * jnp.maximum(up(1), 0.0)
        ph2, _, _, inc2 = R._integrate_block(
            up(2), col(3), col(4), carry[1], s=s, r=ratio, bt=b,
            sample_rate=sample_rate,
        )
        carry[1] = jnp.mod(carry[1] + inc2, two_pi)
        sin2, cos2 = sincos_fast(ph2 + col(5))
        square = tanh_fast(jnp.pi * col(7) * sin2 / 2.0)
        osc2 = (1.0 - col(6) / 2.0) * square * (1.0 + col(6) * cos2)
        mix = mix + col(9) * osc2 * jnp.maximum(up(3), 0.0)
        mix = mix + col(10) * noise_p[:, t * s : (t + 1) * s, :] * jnp.maximum(
            up(4), 0.0
        )
        outs.append(mix.reshape(b, s * ratio))
    return jnp.concatenate(outs, -1)[:, :ta]


def _audio_rate_inputs(cfg, batch_num=42):
    from inverse_audio_synthesis_tpu.synth import modules
    from inverse_audio_synthesis_tpu.synth.voice import (
        _fused_scalars,
        compute_controls,
    )

    params = sample_voice_params(batch_num, cfg)
    p, routed, midi_f0 = compute_controls(params, cfg)
    scalars = _fused_scalars(p, midi_f0)
    noise = modules.noise(
        jax.random.PRNGKey(cfg.noise_seed), cfg.batch_size, cfg.buffer_size
    )
    return routed, scalars, noise


def test_bwd_kernel_matches_replica_vjp():
    """The hand-derived backward kernel vs autodiff of the bit-faithful replica:
    d_scalars to ~1e-6 and d_routed to ~1e-4 relative (residual = jit-fold float
    association between the interpret kernel and the jitted replica, measured
    6e-5 / 1e-6 at head tolerance ~5x)."""
    from inverse_audio_synthesis_tpu.ops.pallas import render as R

    sr = float(CFG.sample_rate)
    routed, scalars, noise = _audio_rate_inputs(CFG)

    # forward parity of the replica itself (sanity of the oracle)
    fk = np.asarray(R.render_audio_fused(routed, scalars, noise, sr, interpret=True))
    fr = np.asarray(jax.jit(_kernel_replica, static_argnums=3)(
        routed, scalars, noise, sr
    ))
    assert np.abs(fk - fr).max() < 2e-3, np.abs(fk - fr).max()

    cot = jax.random.normal(jax.random.PRNGKey(0), fk.shape)
    _, carries = R.render_audio_fused(
        routed, scalars, noise, sr, interpret=True, save_carries=True
    )
    dr_p, ds_p = R.render_audio_fused_bwd(
        routed, scalars, noise, cot, carries, sr, interpret=True
    )
    _, vjp = jax.vjp(
        lambda r_, s_: jax.jit(_kernel_replica, static_argnums=3)(r_, s_, noise, sr),
        routed,
        scalars,
    )
    dr_r, ds_r = vjp(cot)
    dr_p, ds_p, dr_r, ds_r = map(np.asarray, (dr_p, ds_p, dr_r, ds_r))
    assert np.isfinite(dr_p).all() and np.isfinite(ds_p).all()
    assert np.abs(dr_p - dr_r).max() / (np.abs(dr_r).max() + 1e-12) < 5e-4
    assert np.abs(ds_p - ds_r).max() / (np.abs(ds_r).max() + 1e-12) < 1e-4


def test_bwd_kernel_batch_padding_and_carry_slicing():
    """Backward with b=3 (pads 3→BWD tile; forward carries padded to the FWD
    tile, sliced/re-padded by the wrapper) equals the leading rows of a b=8 run
    row-for-row (all chains are per-voice independent)."""
    from inverse_audio_synthesis_tpu.ops.pallas import render as R

    cfg8 = SynthConfig(batch_size=8, buffer_size_seconds=1.0)
    sr = float(cfg8.sample_rate)
    routed, scalars, noise = _audio_rate_inputs(cfg8, batch_num=7)
    cot = jax.random.normal(jax.random.PRNGKey(1), (8, cfg8.buffer_size))

    _, car8 = R.render_audio_fused(
        routed, scalars, noise, sr, interpret=True, save_carries=True
    )
    dr8, ds8 = R.render_audio_fused_bwd(
        routed, scalars, noise, cot, car8, sr, interpret=True
    )
    _, car3 = R.render_audio_fused(
        routed[:3], scalars[:3], noise[:3], sr, interpret=True, save_carries=True
    )
    dr3, ds3 = R.render_audio_fused_bwd(
        routed[:3], scalars[:3], noise[:3], cot[:3], car3, sr, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dr3), np.asarray(dr8)[:3], rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ds3), np.asarray(ds8)[:3], rtol=0, atol=1e-6)


def test_pallas_bwd_end_to_end_vs_jnp_vjp():
    """End-to-end params01-level gradient through bwd="pallas" vs the jnp path's
    VJP: the two forwards integrate phase with different float association
    (segment blocks vs 128-chunks), which ill-conditioned pitch-gradient
    directions amplify — so this is a DIRECTIONAL check (cosine similarity +
    loose relative scale), while exactness is pinned against the replica oracle
    above."""
    params = sample_voice_params(42, CFG)
    cot = jax.random.normal(jax.random.PRNGKey(0), (CFG.batch_size, CFG.buffer_size))
    _, vjp_pallas = jax.vjp(
        lambda q: render_voice_fused(q, CFG, True, bwd="pallas"), params
    )
    _, vjp_jnp = jax.vjp(lambda q: render_voice(q, CFG), params)
    gp = np.asarray(vjp_pallas(cot)[0])
    gj = np.asarray(vjp_jnp(cot)[0])
    assert np.isfinite(gp).all()
    cos = float((gp * gj).sum() / (np.linalg.norm(gp) * np.linalg.norm(gj) + 1e-12))
    assert cos > 0.97, cos

    # on a single-block buffer the phase trajectories coincide, so the two paths
    # agree TIGHTLY end-to-end (measured 1.8e-4 max-rel; degrades with buffer
    # length purely through trajectory decoherence: 9e-3 at 0.57 s, 0.44 at 1 s)
    cfg1 = SynthConfig(batch_size=4, buffer_size_seconds=63 / 441.0)
    p1 = sample_voice_params(42, cfg1)
    c1 = jax.random.normal(jax.random.PRNGKey(0), (4, cfg1.buffer_size))
    _, vp1 = jax.vjp(lambda q: render_voice_fused(q, cfg1, True, bwd="pallas"), p1)
    _, vj1 = jax.vjp(lambda q: render_voice_fused(q, cfg1, True, bwd="jnp"), p1)
    g1p, g1j = np.asarray(vp1(c1)[0]), np.asarray(vj1(c1)[0])
    assert np.abs(g1p - g1j).max() / (np.abs(g1j).max() + 1e-12) < 1e-3

    # jax.grad end-to-end through jit stays finite
    g = jax.jit(
        jax.grad(lambda q: jnp.mean(render_voice_fused(q, CFG, True) ** 2))
    )(params)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_pallas_bwd_shard_map_matches_unsharded():
    """bwd="pallas" under a data=8 mesh (backward kernel inside the shard_map
    body): per-row independence ⇒ sharded gradient equals the unsharded one."""
    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh

    cfg = SynthConfig(batch_size=8, buffer_size_seconds=1.0)
    mesh = create_mesh(data=8, model=1)
    params = sample_voice_params(5, cfg)
    cot = jax.random.normal(jax.random.PRNGKey(0), (cfg.batch_size, cfg.buffer_size))
    _, vjp_sharded = jax.vjp(
        lambda q: render_voice_fused(q, cfg, True, mesh, bwd="pallas"), params
    )
    _, vjp_local = jax.vjp(
        lambda q: render_voice_fused(q, cfg, True, None, bwd="pallas"), params
    )
    g_s = np.asarray(vjp_sharded(cot)[0])
    g_l = np.asarray(vjp_local(cot)[0])
    assert np.isfinite(g_s).all()
    # rtol 2e-3: per-shard batch padding (1 real + 15 pad rows per shard vs 8+8
    # unsharded) shifts a handful of dot associations in the suffix-sum chain —
    # measured a single element at rel 1.1e-3; a real sharding bug (missing or
    # duplicated shard) is O(1) on whole rows
    np.testing.assert_allclose(g_s, g_l, rtol=2e-3, atol=1e-5)

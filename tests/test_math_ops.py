"""ops/math_ops.exp2_accurate: the cross-backend-reproducible exp2 behind the
synth's MIDI→Hz conversion (see module docstring for why the builtin is unusable:
XLA and Mosaic ship two different ~5e-6 approximations, which integrated over
~1e5 rad of phase drifts the fused/jnp renders ~0.4 rad apart)."""

import numpy as np

import jax.numpy as jnp

from inverse_audio_synthesis_tpu.ops.math_ops import (
    cos_fast,
    exp2_accurate,
    sin_fast,
    sincos_fast,
    tanh_fast,
)


def test_exp2_accurate_relative_error():
    # the synth evaluates exp2 on (midi - 69)/12 ∈ [-5.75, 4.83]; test well beyond
    x = np.linspace(-40.0, 40.0, 400001).astype(np.float32)
    got = np.asarray(exp2_accurate(jnp.asarray(x)), np.float64)
    ref = np.exp2(x.astype(np.float64))
    rel = np.abs(got - ref) / ref
    assert rel.max() < 2e-7, rel.max()  # ~2 ulps fp32


def test_exp2_accurate_exact_integer_powers():
    n = np.arange(-30, 31, dtype=np.float32)
    got = np.asarray(exp2_accurate(jnp.asarray(n)))
    np.testing.assert_array_equal(got, np.exp2(n))


def test_exp2_accurate_monotone():
    x = np.linspace(-10.0, 10.0, 200001).astype(np.float32)
    got = np.asarray(exp2_accurate(jnp.asarray(x)))
    assert (np.diff(got) >= 0).all()


# --- fast polynomial trig (audio-rate oscillator path) -------------------------


def _trig_domain():
    """Dense sweep of the wrapped-phase domain (|arg| ≲ 400 rad in both render
    paths) plus the full supported |x| ≤ 4096 and quadrant boundaries."""
    rng = np.random.default_rng(7)
    xs = [
        np.linspace(-400.0, 400.0, 400001),
        rng.uniform(-4096.0, 4096.0, 200000),
        np.arange(-2600, 2600) * (np.pi / 2),  # exact-ish quadrant edges
        np.arange(-2600, 2600) * (np.pi / 2) + 1e-6,
        np.arange(-2600, 2600) * (np.pi / 2) - 1e-6,
    ]
    return np.concatenate(xs).astype(np.float32)


def test_sincos_fast_accuracy():
    x = _trig_domain()
    s, c = sincos_fast(jnp.asarray(x))
    x64 = x.astype(np.float64)
    # measured 7.05e-8 (~1.2 ulp at |sin|=1) on CPU; 2e-7 leaves slack for any
    # exactly-rounded-but-different op ordering a backend might introduce
    assert np.abs(np.asarray(s, np.float64) - np.sin(x64)).max() < 2e-7
    assert np.abs(np.asarray(c, np.float64) - np.cos(x64)).max() < 2e-7


def test_sin_cos_fast_match_pair():
    # the single-output wrappers are the same reduction + selection
    x = jnp.asarray(_trig_domain()[:50000])
    s, c = sincos_fast(x)
    np.testing.assert_array_equal(np.asarray(sin_fast(x)), np.asarray(s))
    np.testing.assert_array_equal(np.asarray(cos_fast(x)), np.asarray(c))


def test_sincos_fast_pythagorean():
    x = jnp.asarray(_trig_domain()[::7])
    s, c = sincos_fast(x)
    np.testing.assert_allclose(
        np.asarray(s, np.float64) ** 2 + np.asarray(c, np.float64) ** 2, 1.0,
        atol=4e-7,
    )


def test_tanh_fast_accuracy_and_saturation():
    rng = np.random.default_rng(3)
    x = np.concatenate(
        [np.linspace(-8.0, 8.0, 200001), rng.uniform(-80.0, 80.0, 100000)]
    ).astype(np.float32)
    got = np.asarray(tanh_fast(jnp.asarray(x)), np.float64)
    ref = np.tanh(x.astype(np.float64))
    assert np.abs(got - ref).max() < 3e-7
    # saturated tails are exactly ±1 (no overflow from the exp2 underneath)
    big = np.asarray(tanh_fast(jnp.asarray([1e30, -1e30, np.float32(500.0)])))
    np.testing.assert_array_equal(big, [1.0, -1.0, 1.0])

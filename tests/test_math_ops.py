"""ops/math_ops.exp2_accurate: the cross-backend-reproducible exp2 behind the
synth's MIDI→Hz conversion (see module docstring for why the builtin is unusable:
XLA and Mosaic ship two different ~5e-6 approximations, which integrated over
~1e5 rad of phase drifts the fused/jnp renders ~0.4 rad apart)."""

import numpy as np

import jax.numpy as jnp

from inverse_audio_synthesis_tpu.ops.math_ops import exp2_accurate


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

"""TPU-first cumsum/upsample reformulations: numerical equivalence with references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.ops.scan_ops import chunked_cumsum, linear_upsample


@pytest.mark.parametrize("shape", [(4, 1764), (2, 176400), (3, 100), (1, 128 * 7)])
def test_chunked_cumsum_matches_cumsum(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    ours = np.asarray(chunked_cumsum(x))
    ref = np.cumsum(np.asarray(x, dtype=np.float64), axis=-1)
    # fp32 cumsum over 176k elements accumulates error ~1e-3 regardless of method
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-2)


def test_chunked_cumsum_odd_length_pads_to_chunk():
    # non-divisible lengths are zero-padded onto the chunk grid (padding is exact
    # for prefix sums), not routed to a fallback
    x = jnp.asarray(np.random.RandomState(1).randn(2, 777).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(chunked_cumsum(x)), np.asarray(jnp.cumsum(x, axis=-1)), rtol=1e-5,
        atol=1e-5,
    )


def test_phase_cumsum_accurate_at_production_length():
    """176,400 samples (the 4-s buffer) is NOT divisible by the 128 chunk; the old
    fallback integrated unwrapped phase to ~1e5 rad where fp32 adds round by ~0.008
    rad each — 0.51 rad accumulated drift, caught on-chip by bench.py's parity gate.
    The padded chunked path must stay circularly close to the fp64 integral."""
    from inverse_audio_synthesis_tpu.ops.scan_ops import phase_cumsum

    rng = np.random.RandomState(2)
    # dphi for a ~2-12 kHz oscillator at 44.1 kHz: ~0.3-1.7 rad per sample
    dphi = (0.3 + 1.4 * rng.rand(2, 176400)).astype(np.float32)
    got = np.asarray(phase_cumsum(jnp.asarray(dphi)), dtype=np.float64)
    exact = np.cumsum(dphi.astype(np.float64), axis=-1)
    # circular distance (both feed periodic consumers only)
    delta = np.angle(np.exp(1j * (got - exact)))
    assert np.abs(delta).max() < 0.02, np.abs(delta).max()


@pytest.mark.parametrize("tc,ratio,atol", [(1764, 100, 1e-3), (121, 4, 2e-6), (16, 2, 2e-6)])
def test_linear_upsample_matches_resize(tc, ratio, atol):
    # at 176k outputs, resize's fp32 position arithmetic rounds by up to ~0.015 samples
    # (eps at index 176400); our closed form is exact, hence the looser large-T atol
    x = jnp.asarray(np.random.RandomState(2).randn(3, tc).astype(np.float32))
    ours = np.asarray(linear_upsample(x, tc * ratio))
    ref = np.asarray(jax.image.resize(x, (3, tc * ratio), method="linear"))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-4)


def test_linear_upsample_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(3).randn(2, 50).astype(np.float32)
    ours = np.asarray(linear_upsample(jnp.asarray(x), 5000))
    theirs = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x)[:, None, :], size=5000, mode="linear",
            align_corners=False,
        )
        .squeeze(1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)

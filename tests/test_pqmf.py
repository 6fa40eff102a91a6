"""PQMF parity vs. the reference torch implementation and round-trip on daddy.wav
(BASELINE.json config 0)."""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_audio_synthesis_tpu.ops.pqmf import PQMF
from inverse_audio_synthesis_tpu.utils.audio_io import read_wav

from conftest import REFERENCE_DIR, load_reference_module


def _daddy_mono(n=176400):
    audio, rate = read_wav(REFERENCE_DIR / "daddy.wav")
    assert rate == 44100
    mono = audio.mean(axis=1)
    return mono[:n].astype(np.float32)


@pytest.mark.parametrize("n_bands", [3, 4])
def test_analysis_synthesis_parity_vs_reference(reference_dir, n_bands):
    torch = pytest.importorskip("torch")
    ref_pqmf_mod = load_reference_module("pqmf")

    x = _daddy_mono()[None, None, :]  # [1, 1, T]
    ref = ref_pqmf_mod.PQMF(N=n_bands)
    with torch.no_grad():
        ref_bands = ref.analysis(torch.from_numpy(x)).numpy()
        ref_recon = ref.synthesis(torch.from_numpy(ref_bands)).numpy()

    ours = PQMF(n_bands=n_bands)
    bands = np.asarray(ours.analysis(jnp.asarray(x)))
    recon = np.asarray(ours.synthesis(jnp.asarray(bands)))

    assert bands.shape == ref_bands.shape
    assert recon.shape == ref_recon.shape
    np.testing.assert_allclose(bands, ref_bands, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(recon, ref_recon, atol=1e-4, rtol=1e-4)


def test_round_trip_reconstruction(reference_dir):
    """analysis ∘ synthesis ≈ identity up to the reference design's limits.

    The reference's prototype filter (taps=62, cutoff=0.15) targets N=4; the cascade
    has a 1-sample delay (from the (taps-1)/2 modulation centering, reference
    pqmf.py:26). N=4 reconstructs to ~-16 dB on daddy.wav; the pipeline's N=3 config
    (reference vicreg_audio_params.py:40) is lossier and only used as a feature
    extractor. These thresholds pin the reference's own behavior (parity ≤1e-4 with
    the torch implementation is asserted separately above).
    """
    x = _daddy_mono()
    for n_bands, max_err in [(4, 0.2), (3, 0.75)]:
        pqmf = PQMF(n_bands=n_bands)
        bands = pqmf.analysis(jnp.asarray(x[None, None, :]))
        recon = np.asarray(pqmf.synthesis(bands))[0, 0]
        delay = 1
        a = x[: len(x) - delay][1000:-1000]
        b = recon[delay:][1000:-1000]
        err = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a**2)) + 1e-9)
        assert err < max_err, f"N={n_bands} round-trip error {err} > {max_err}"


def test_shapes():
    pqmf = PQMF(n_bands=3)
    x = jnp.zeros((2, 1, 176400))
    bands = pqmf.analysis(x)
    assert bands.shape == (2, 3, 58800)  # reference: audioembed.py:40-41
    recon = pqmf.synthesis(bands)
    assert recon.shape == (2, 1, 176400)


def test_imgscale8_roundtrip():
    from inverse_audio_synthesis_tpu.ops.imgscale8 import scale8, unscale8

    x = jnp.linspace(-1.6, 1.5, 1000)
    x8 = scale8(x)
    assert x8.dtype == jnp.uint8
    xr = unscale8(x8)
    assert float(jnp.max(jnp.abs(xr - x))) < (1.5680482 + 1.6843455) / 255.0

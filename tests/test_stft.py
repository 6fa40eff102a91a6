"""STFT / mel / spectral losses: numerical properties + torch parity where possible."""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_audio_synthesis_tpu.ops.stft import (
    MelSpectrogram,
    hann_window,
    mel_filterbank,
    multi_resolution_stft_loss,
    spectrogram,
    stft,
)


def _sine(freq=440.0, sr=44100, t=1.0):
    n = np.arange(int(sr * t))
    return np.sin(2 * np.pi * freq * n / sr).astype(np.float32)


def test_stft_peak_bin():
    x = jnp.asarray(_sine(1000.0))[None, :]
    spec = np.abs(np.asarray(stft(x, n_fft=2048, hop_length=512)))[0]
    peak_bins = spec.argmax(axis=0)
    expected = round(1000.0 / (44100 / 2048))
    assert np.all(np.abs(peak_bins[2:-2] - expected) <= 1)


def test_stft_parity_vs_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 8192).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft=1024, hop_length=256))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=1024,
        hop_length=256,
        window=torch.hann_window(1024),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_hann_parity_vs_torch():
    torch = pytest.importorskip("torch")
    np.testing.assert_allclose(
        np.asarray(hann_window(400)), torch.hann_window(400).numpy(), atol=1e-6
    )


def test_mel_shapes_and_energy():
    mel = MelSpectrogram(sample_rate=44100, n_fft=1024, hop_length=512, n_mels=128)
    x = jnp.asarray(np.random.RandomState(1).randn(3, 44100).astype(np.float32))
    m = np.asarray(mel(x))
    assert m.shape == (3, 128, 44100 // 512 + 1)
    assert (m >= 0).all() and np.isfinite(m).all()
    # louder signal ⇒ more mel energy
    m2 = np.asarray(mel(2.0 * x))
    assert m2.sum() > 3.0 * m.sum()


def test_mel_filterbank_properties():
    fb = mel_filterbank(513, 64, 44100, norm="slaney", mel_scale="htk")
    assert fb.shape == (513, 64)
    assert (fb >= 0).all()
    # every filter has support, and each is localized (unimodal triangles)
    assert (fb.sum(axis=0) > 0).all()
    centers = fb.argmax(axis=0)
    assert np.all(np.diff(centers) >= 0)  # monotone center frequencies


def test_multi_res_stft_loss_metricity():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(2, 16384).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 16384).astype(np.float32))
    zero = float(multi_resolution_stft_loss(a, a))
    near = float(multi_resolution_stft_loss(a + 0.01 * b, a))
    far = float(multi_resolution_stft_loss(b, a))
    assert zero == pytest.approx(0.0, abs=1e-5)
    assert zero < near < far


def test_multi_res_stft_loss_batch_chunking_exact():
    """Chunked evaluation (incl. a zero-padded tail chunk) must reproduce the
    unchunked loss — the sufficient statistics decompose exactly over batch
    chunks. Guards the memory fix for the reference's downstream batch 1024,
    whose unchunked DFT intermediate (~25 GB) OOMs a 16 GB chip."""
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(5, 16384).astype(np.float32))
    b = jnp.asarray(rng.randn(5, 16384).astype(np.float32))
    whole = float(multi_resolution_stft_loss(b, a, batch_chunk=256))
    chunked = float(multi_resolution_stft_loss(b, a, batch_chunk=2))  # 3 chunks, 1 padded
    assert whole == pytest.approx(chunked, rel=1e-5)


def test_multi_res_stft_silence_baseline_analytic():
    """The analytic silence baseline (|silence|=0 ⇒ sc=1, log-mag at the floor)
    must equal explicitly scoring a zero signal against true."""
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(2, 16384).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 16384).astype(np.float32))
    _, silence_analytic = multi_resolution_stft_loss(
        b, a, return_silence_baseline=True
    )
    silence_explicit = multi_resolution_stft_loss(jnp.zeros_like(a), a)
    assert float(silence_analytic) == pytest.approx(float(silence_explicit), rel=1e-6)


def test_spectrogram_power():
    x = jnp.asarray(_sine())[None, :]
    p1 = np.asarray(spectrogram(x, power=1.0, n_fft=512, hop_length=256))
    p2 = np.asarray(spectrogram(x, power=2.0, n_fft=512, hop_length=256))
    np.testing.assert_allclose(p1**2, p2, rtol=1e-4, atol=1e-5)


def test_conv_spectrogram_matches_fft():
    from inverse_audio_synthesis_tpu.ops.stft import power_spectrogram_conv

    x = jnp.asarray(_sine(440.0, t=0.5))[None, :]
    ref = np.asarray(spectrogram(x, power=2.0, n_fft=1024, hop_length=512))
    # fp32 conv path first (isolates formulation from precision)
    exact = np.asarray(
        power_spectrogram_conv(
            x, n_fft=1024, hop_length=512, compute_dtype=jnp.float32
        )
    )
    assert exact.shape == ref.shape
    np.testing.assert_allclose(exact, ref, atol=1e-2, rtol=1e-3)
    # bf16 path: relative accuracy ~1e-2 on the power spectrum
    approx = np.asarray(power_spectrogram_conv(x, n_fft=1024, hop_length=512))
    rel = np.abs(approx - ref) / (np.abs(ref) + 1e-3 * ref.max())
    assert np.median(rel) < 0.05


def test_mel_conv_method():
    mel_fft = MelSpectrogram(44100, 1024, None, 512, n_mels=64)
    mel_conv = MelSpectrogram(44100, 1024, None, 512, n_mels=64, method="conv_bf16")
    x = jnp.asarray(np.random.RandomState(5).randn(2, 22050).astype(np.float32))
    a, b = np.asarray(mel_fft(x)), np.asarray(mel_conv(x))
    assert a.shape == b.shape
    rel = np.abs(a - b) / (np.abs(a) + 1e-3 * a.max())
    assert np.median(rel) < 0.05


def test_matmul_spectrogram_matches_fft():
    from inverse_audio_synthesis_tpu.ops.stft import power_spectrogram_matmul

    x = jnp.asarray(_sine(440.0, t=0.5))[None, :]
    ref = np.asarray(spectrogram(x, power=2.0, n_fft=1024, hop_length=512))
    # fp32 first: the reshape-framing formulation must be exact vs gather-framing
    exact = np.asarray(
        power_spectrogram_matmul(
            x, n_fft=1024, hop_length=512, compute_dtype=jnp.float32
        )
    )
    assert exact.shape == ref.shape
    np.testing.assert_allclose(exact, ref, atol=1e-2, rtol=1e-3)
    approx = np.asarray(power_spectrogram_matmul(x, n_fft=1024, hop_length=512))
    rel = np.abs(approx - ref) / (np.abs(ref) + 1e-3 * ref.max())
    assert np.median(rel) < 0.05
    # hop=256 (n_fft/4) exercises blocks_per_frame=4
    ref4 = np.asarray(spectrogram(x, power=2.0, n_fft=1024, hop_length=256))
    got4 = np.asarray(
        power_spectrogram_matmul(
            x, n_fft=1024, hop_length=256, compute_dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(got4, ref4, atol=1e-2, rtol=1e-3)


def test_matmul_spectrogram_short_window_matches_fft():
    """win_length < n_fft takes the window-span contraction (frames cover only
    ceil(win/hop)*hop samples at the window offset) — must still equal the
    full-frame FFT reference exactly in fp32."""
    from inverse_audio_synthesis_tpu.ops.stft import power_spectrogram_matmul

    x = jnp.asarray(np.random.RandomState(6).randn(2, 22050).astype(np.float32))
    ref = np.asarray(
        spectrogram(x, power=2.0, n_fft=1024, hop_length=256, win_length=400)
    )
    got = np.asarray(
        power_spectrogram_matmul(
            x, n_fft=1024, hop_length=256, win_length=400,
            compute_dtype=jnp.float32,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-3)


@pytest.mark.slow
def test_magnitude_stft_matmul_matches_fft():
    """The fast MXU magnitude path stays within bf16 tolerance of the exact FFT at
    the MR-STFT resolutions (arbitrary, non-dividing hops)."""
    from inverse_audio_synthesis_tpu.ops.stft import magnitude_stft_matmul, stft

    x = jnp.asarray(np.random.RandomState(1).randn(2, 44100).astype(np.float32))
    for n_fft, hop, win in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        ref = np.asarray(jnp.abs(stft(x, n_fft=n_fft, hop_length=hop, win_length=win)))
        # fp32 compute: framing + matmul-DFT formulation must be exact
        exact = np.asarray(
            magnitude_stft_matmul(
                x, n_fft, hop_length=hop, win_length=win, compute_dtype=jnp.float32
            )
        )
        assert exact.shape == ref.shape
        # fp32 matmul-DFT vs FFT differ only by accumulation order: ~5e-3 abs noise
        # near spectral zeros on a ~40 magnitude scale (same bar as the conv tests)
        np.testing.assert_allclose(exact, ref, atol=1e-2, rtol=1e-3)
        approx = np.asarray(
            magnitude_stft_matmul(x, n_fft, hop_length=hop, win_length=win)
        )
        assert np.max(np.abs(approx - ref)) / ref.max() < 1e-2


def test_mrstft_matmul_method_close_to_fft():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(2, 44100).astype(np.float32))
    b = jnp.asarray((rng.randn(2, 44100) * 0.5).astype(np.float32))
    exact = float(multi_resolution_stft_loss(b, a))
    fast = float(multi_resolution_stft_loss(b, a, method="matmul_bf16"))
    assert abs(fast - exact) / exact < 0.02


def test_mel_matmul_method():
    mel_fft = MelSpectrogram(44100, 1024, None, 512, n_mels=64)
    mel_mm = MelSpectrogram(44100, 1024, None, 512, n_mels=64, method="matmul_bf16")
    x = jnp.asarray(np.random.RandomState(5).randn(2, 22050).astype(np.float32))
    a, b = np.asarray(mel_fft(x)), np.asarray(mel_mm(x))
    assert a.shape == b.shape
    rel = np.abs(a - b) / (np.abs(a) + 1e-3 * a.max())
    assert np.median(rel) < 0.05
    # non-dividing hop: handled natively by the zero-padded-basis reshape framing
    mel_nd_fft = MelSpectrogram(44100, 1024, None, 500, n_mels=64)
    mel_nd_mm = MelSpectrogram(44100, 1024, None, 500, n_mels=64, method="matmul_bf16")
    assert mel_nd_mm.method == "matmul_bf16"
    c, d = np.asarray(mel_nd_fft(x)), np.asarray(mel_nd_mm(x))
    assert c.shape == d.shape
    rel = np.abs(c - d) / (np.abs(c) + 1e-3 * c.max())
    assert np.median(rel) < 0.05


def test_f32_split_method_near_exact():
    """The matmul_f32 (split hi/lo) method reaches ~1e-5 relative of the exact FFT
    path — vs ~2e-3 for matmul_bf16 — while staying on the MXU (three bf16 matmuls;
    see ops/stft.py _dft_dot). This is the metric-fidelity option ADVICE flagged:
    reported test metrics need not be bf16-approximate."""
    from inverse_audio_synthesis_tpu.ops.stft import magnitude_stft_matmul, stft

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 44100).astype(np.float32))
    for n_fft, hop, win in [(1024, 120, 600), (512, 50, 240)]:
        ref = np.asarray(jnp.abs(stft(x, n_fft=n_fft, hop_length=hop, win_length=win)))
        got = np.asarray(
            magnitude_stft_matmul(
                x, n_fft, hop_length=hop, win_length=win, compute_dtype="f32_split"
            )
        )
        assert np.max(np.abs(got - ref)) / ref.max() < 5e-5

    # MR-STFT loss via the split path: well inside the fft value's 1e-3
    a = jnp.asarray(rng.randn(2, 44100).astype(np.float32))
    b = jnp.asarray((rng.randn(2, 44100) * 0.5).astype(np.float32))
    exact = float(multi_resolution_stft_loss(b, a))
    split = float(multi_resolution_stft_loss(b, a, method="matmul_f32"))
    assert abs(split - exact) / exact < 1e-3

    # mel path end-to-end
    mel_fft = MelSpectrogram(44100, 1024, None, 500, n_mels=64)
    mel_split = MelSpectrogram(44100, 1024, None, 500, n_mels=64, method="matmul_f32")
    m_ref, m_got = np.asarray(mel_fft(x)), np.asarray(mel_split(x))
    assert np.max(np.abs(m_got - m_ref)) / m_ref.max() < 5e-5

"""STFT, mel spectrogram, and multi-resolution spectral losses in pure XLA.

The reference builds a torchaudio MelSpectrogram from ``cfg.mel.*``
(reference: evaluate_audio_representations.py:110-123; config block at
conf/config.yaml:51-61) and aspires to an auraloss multi-resolution STFT loss
(reference: audio_to_params.py:233, evaluate_audio_representations.py:77-78). Both are
first-class here: BASELINE.json's north star scores downstream resynthesis with the
multi-res STFT loss.

Semantics follow torchaudio defaults: hann window, center=True with reflect padding,
power spectrogram, HTK mel scale with slaney area normalization.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> jnp.ndarray:
    # periodic hann (torch.hann_window default)
    n = jnp.arange(win_length)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))


def frame_signal(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """[..., T] → [..., n_frames, frame_length] via gather (static shapes)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(frame_length)[None, :]
    )
    return x[..., idx]




def stft(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT of [..., T] → [..., n_freq, n_frames] (torch layout)."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    spec = jnp.fft.rfft(frames * window.astype(x.dtype), axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def spectrogram(x: jax.Array, power: float = 2.0, **stft_kwargs) -> jax.Array:
    mag = jnp.abs(stft(x, **stft_kwargs))
    return mag if power == 1.0 else jnp.power(mag, power)


def _frame_by_reshape(xb: jax.Array, frame_length: int, hop_length: int, n_frames: int) -> jax.Array:
    """[B, T] → [B, n_frames, frame_length] with ZERO gathers (gathers are slow on
    TPU): reshape to hop blocks and concatenate ``frame_length // hop`` consecutive
    block windows — all layout ops XLA folds away. Requires hop | frame_length and
    T ≥ (n_frames-1)·hop + frame_length."""
    blocks_per_frame = frame_length // hop_length
    n_hops = n_frames - 1 + blocks_per_frame
    xb = xb[:, : n_hops * hop_length]
    hops = xb.reshape(xb.shape[0], n_hops, hop_length)
    return jnp.concatenate(
        [hops[:, i : i + n_frames] for i in range(blocks_per_frame)], axis=-1
    )


def _windowed_dft_basis(n_fft: int, win_length: int) -> jax.Array:
    """Real-DFT analysis basis [2*n_freq, n_fft]: rows 0..n_freq-1 are cos·window,
    rows n_freq.. are −sin·window (window center-padded to n_fft when shorter).
    Built on-device from iota — a host-side constant this size would bloat the
    serialized HLO past the remote-compile request limit. Shared by the conv and
    matmul spectrogram paths so window/DFT semantics can't silently diverge."""
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    n_freq = n_fft // 2 + 1
    k = jax.lax.broadcasted_iota(jnp.float32, (n_freq, n_fft), 0)
    n = jax.lax.broadcasted_iota(jnp.float32, (n_freq, n_fft), 1)
    ang = 2.0 * jnp.pi * k * n / n_fft
    return jnp.concatenate([jnp.cos(ang), -jnp.sin(ang)], axis=0) * window[None, :]


def power_spectrogram_conv(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Power spectrogram as ONE strided convolution with windowed DFT filters.

    TPU-first alternative to gather-framing + rfft: the conv lowers to an implicit
    GEMM on the MXU (bf16 operands, fp32 accumulation). ~1e-3 relative accuracy vs the
    fp32 FFT path — fine for mel features/retrieval; keep the FFT path for losses that
    need exact parity. [..., T] → [..., n_freq, n_frames]."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    n_freq = n_fft // 2 + 1
    basis = _windowed_dft_basis(n_fft, win_length)

    lead = x.shape[:-1]
    xb = x.reshape(-1, 1, x.shape[-1])
    if center:
        pad = n_fft // 2
        xb = jnp.pad(xb, [(0, 0), (0, 0), (pad, pad)], mode=pad_mode)
    y = jax.lax.conv_general_dilated(
        xb.astype(compute_dtype),
        basis[:, None, :].astype(compute_dtype),
        window_strides=(hop_length,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )  # [B, 2*n_freq, n_frames]
    re, im = y[:, :n_freq], y[:, n_freq:]
    return (re * re + im * im).reshape(*lead, n_freq, y.shape[-1])


def _dft_dot(frames: jax.Array, basis: jax.Array, compute_dtype) -> jax.Array:
    """``frames @ basis`` (contract last axis of frames with axis 0 of basis) with
    fp32 accumulation.

    ``compute_dtype="f32_split"`` reaches ~1e-6 relative accuracy on the MXU with
    THREE bf16 matmuls: split each operand x = hi + lo with hi = bf16(x) — hi·hi
    products are exact in fp32 accumulation (8-bit mantissas), hi·lo and lo·hi
    carry the first-order residuals, and the dropped lo·lo term is ~2^-16
    relative. (The operands here really are bf16 *dtype*, so XLA cannot fold the
    split away — unlike the fp32-valued round-trip cast, which the simplifier
    removes; see ops/scan_ops.py. ``precision=HIGHEST`` is an equally accurate
    XLA-side alternative but costs 6 passes instead of 3.)

    For the plain bf16 path the matmul OUTPUT is also written as bf16 (the
    convert fuses into the dot epilogue): at the MR-STFT resolutions the y
    tensors are the dominant HBM traffic (~3 GB fp32 per resolution at b128
    stacked pred/true), and the consumers (magnitude, log, reductions) are a
    single fused read — halving both sides of that round trip is worth ~2e-3
    extra relative error on an already ~2e-3-class path."""
    dims = (((frames.ndim - 1,), (0,)), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)

    if compute_dtype == "f32_split":
        fh = frames.astype(jnp.bfloat16)
        fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = basis.astype(jnp.bfloat16)
        bl = (basis - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(fh, bh) + dot(fh, bl) + dot(fl, bh)
    out = dot(frames.astype(compute_dtype), basis.astype(compute_dtype))
    if compute_dtype == jnp.bfloat16:
        out = out.astype(jnp.bfloat16)
    return out


def _framed_dft_matmul(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool,
    pad_mode: str,
    compute_dtype,
):
    """Shared core of the matmul spectrogram paths: reshape-framing + ONE dense
    DFT matmul on the MXU. Returns (y [B, n_frames, 2*n_freq], n_freq, lead).

    Works for ARBITRARY hop, and contracts only over the WINDOW SPAN: the
    windowed basis is zero outside the centered ``win_length`` cols, so the
    frames start at the window offset and cover ceil(win/hop)·hop samples — at
    the MR-STFT resolutions (win 600/1024, 1200/2048, 240/512) this roughly
    HALVES the matmul FLOPs vs contracting over full n_fft frames. Framing is
    reshape+concat (zero gathers — ``_frame_by_reshape``); any zero-padded
    basis tail cols just meet real signal (and signal tail zeros meet real
    window cols), both exact."""
    assert win_length <= n_fft, (win_length, n_fft)  # torch.stft contract
    n_freq = n_fft // 2 + 1
    lpad = (n_fft - win_length) // 2  # window offset inside each n_fft frame
    frame_len = -(-win_length // hop_length) * hop_length  # next hop multiple
    basis = _windowed_dft_basis(n_fft, win_length)[:, lpad : lpad + win_length]
    if frame_len > win_length:
        basis = jnp.pad(basis, [(0, 0), (0, frame_len - win_length)])
    basis = basis.T  # [frame_len, 2*n_freq]: the frame matmul is frames @ basis

    lead = x.shape[:-1]
    xb = x.reshape(-1, x.shape[-1])
    if center:
        pad = n_fft // 2
        xb = jnp.pad(xb, [(0, 0), (pad, pad)], mode=pad_mode)
    t = xb.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length  # frame count set by the REAL window
    xb = xb[:, lpad:]  # frames now start where the window starts
    need = (n_frames - 1) * hop_length + frame_len
    if need > t - lpad:
        xb = jnp.pad(xb, [(0, 0), (0, need - (t - lpad))])
    frames = _frame_by_reshape(xb, frame_len, hop_length, n_frames)
    y = _dft_dot(frames, basis, compute_dtype)  # [B, n_frames, 2*n_freq]
    return y, n_freq, lead


def power_spectrogram_matmul(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    compute_dtype=jnp.bfloat16,
    mel_fb: Optional[jax.Array] = None,
) -> jax.Array:
    """Power spectrogram via ``_framed_dft_matmul`` (reshape-framing + one dense
    bf16 MXU matmul — measured ~7 ms → ~1 ms vs the strided conv at the benchmark
    shape). If ``mel_fb`` [n_freq, n_mels] is given, the mel projection is fused
    here and the return is [..., n_mels, n_frames]; otherwise
    [..., n_freq, n_frames]."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    y, n_freq, lead = _framed_dft_matmul(
        x, n_fft, hop_length, win_length, center, pad_mode, compute_dtype
    )
    re = y[..., :n_freq].astype(jnp.float32)
    im = y[..., n_freq:].astype(jnp.float32)
    spec = re * re + im * im  # [B, n_frames, n_freq]
    if mel_fb is not None:
        spec = _dft_dot(spec, mel_fb, compute_dtype).astype(jnp.float32)
    out = jnp.swapaxes(spec, -1, -2)
    return out.reshape(*lead, *out.shape[-2:])


def magnitude_stft_matmul(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """STFT magnitude via ``_framed_dft_matmul`` (reshape framing + one bf16 DFT
    matmul contracting over the window span; gather framing was measured ~2x
    slower at the MR-STFT resolutions, and a gcd-strided-slice framing was tried
    and reverted: sub-lane-width slice tails pad up to 64x on TPU and OOM).

    [..., T] → [..., n_freq, n_frames] (torch layout), ~2e-3 relative accuracy vs
    the fp32 FFT path. TPU FFTs are slow (measured ~36 ms for one b128 4-s signal at
    n_fft 1024 / hop 120 vs ~8 ms here); use this for spectral metrics/losses and
    keep the FFT path where exact parity matters."""
    y, n_freq, lead = _framed_dft_matmul(
        x, n_fft, hop_length, win_length, center, pad_mode, compute_dtype
    )
    re = y[..., :n_freq].astype(jnp.float32)
    im = y[..., n_freq:].astype(jnp.float32)
    mag = jnp.swapaxes(jnp.sqrt(re * re + im * im), -1, -2)
    return mag.reshape(*lead, *mag.shape[-2:])


def hz_to_mel(f, mel_scale: str = "htk"):
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    # slaney
    f = np.asarray(f, dtype=np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0), mel)
    return mel


def mel_to_hz(m, mel_scale: str = "htk"):
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    norm: Optional[str] = "slaney",
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels] (torchaudio.functional.melscale_fbanks
    semantics). Built on the host once; a trace-time constant."""
    f_max = f_max or sample_rate / 2.0
    freqs = np.linspace(0, sample_rate // 2, n_freqs)
    mel_pts = np.linspace(
        hz_to_mel(f_min, mel_scale), hz_to_mel(f_max, mel_scale), n_mels + 2
    )
    f_pts = mel_to_hz(mel_pts, mel_scale)
    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        fb *= (2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels]))[None, :]
    return fb.astype(np.float32)


class MelSpectrogram:
    """torchaudio-MelSpectrogram-shaped callable: [..., T] → [..., n_mels, n_frames]."""

    def __init__(
        self,
        sample_rate: int = 44100,
        n_fft: int = 1024,
        win_length: Optional[int] = None,
        hop_length: int = 512,
        center: bool = True,
        pad_mode: str = "reflect",
        power: float = 2.0,
        norm: Optional[str] = "slaney",
        n_mels: int = 128,
        mel_scale: str = "htk",
        f_min: float = 0.0,
        f_max: Optional[float] = None,
        # "fft" (exact fp32) | "conv_bf16" | "matmul_bf16" (MXU, ~2e-3 rel)
        # | "matmul_f32" (MXU split hi/lo, ~1e-6 rel at ~2x matmul_bf16 cost)
        method: str = "fft",
    ):
        # matmul_* handles arbitrary hops (zero-padded basis rows), so no
        # conv_bf16 fallback is needed for non-dividing hops anymore
        self.method = method
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.power = power
        self.fb = jnp.asarray(
            mel_filterbank(
                n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max, norm, mel_scale
            )
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.method in ("matmul_bf16", "matmul_f32"):
            dtype = "f32_split" if self.method == "matmul_f32" else jnp.bfloat16
            if self.power == 2.0:
                return power_spectrogram_matmul(
                    x,
                    n_fft=self.n_fft,
                    hop_length=self.hop_length,
                    win_length=self.win_length,
                    center=self.center,
                    pad_mode=self.pad_mode,
                    compute_dtype=dtype,
                    mel_fb=self.fb,
                )
            spec = power_spectrogram_matmul(
                x,
                n_fft=self.n_fft,
                hop_length=self.hop_length,
                win_length=self.win_length,
                center=self.center,
                pad_mode=self.pad_mode,
                compute_dtype=dtype,
            )
            spec = jnp.power(jnp.sqrt(jnp.maximum(spec, 0.0)), self.power)
        elif self.method == "conv_bf16":
            spec = power_spectrogram_conv(
                x,
                n_fft=self.n_fft,
                hop_length=self.hop_length,
                win_length=self.win_length,
                center=self.center,
                pad_mode=self.pad_mode,
            )
            if self.power != 2.0:
                spec = jnp.power(jnp.sqrt(jnp.maximum(spec, 0.0)), self.power)
        else:
            spec = spectrogram(
                x,
                power=self.power,
                n_fft=self.n_fft,
                hop_length=self.hop_length,
                win_length=self.win_length,
                center=self.center,
                pad_mode=self.pad_mode,
            )  # [..., n_freq, n_frames]
        return jnp.einsum("...ft,fm->...mt", spec, self.fb.astype(spec.dtype))


# ---------------------------------------------------------------------------
# Spectral losses
# ---------------------------------------------------------------------------


def spectral_convergence_loss(mag_pred: jax.Array, mag_true: jax.Array) -> jax.Array:
    num = jnp.sqrt(jnp.sum((mag_true - mag_pred) ** 2))
    den = jnp.sqrt(jnp.sum(mag_true**2)) + 1e-8
    return num / den


def log_stft_magnitude_loss(mag_pred: jax.Array, mag_true: jax.Array) -> jax.Array:
    return jnp.mean(
        jnp.abs(jnp.log(jnp.maximum(mag_true, 1e-7)) - jnp.log(jnp.maximum(mag_pred, 1e-7)))
    )


def multi_resolution_stft_loss(
    pred: jax.Array,
    true: jax.Array,
    resolutions: Sequence[Tuple[int, int, int]] = (
        (1024, 120, 600),
        (2048, 240, 1200),
        (512, 50, 240),
    ),
    # "fft" (exact fp32) | "matmul_bf16" (MXU, ~2e-3, ~6x faster) | "matmul_f32"
    # (MXU split hi/lo, ~1e-6 rel, ~2x matmul_bf16 cost)
    method: str = "fft",
    batch_chunk: int = 256,
    return_silence_baseline: bool = False,
):
    """auraloss-style MR-STFT loss: mean over resolutions of
    (spectral convergence + log-magnitude L1). resolutions = (n_fft, hop, win).

    ``return_silence_baseline=True`` also returns the loss of the constant-silence
    predictor against ``true`` — computed ANALYTICALLY from the already-computed
    true magnitudes (|silence| = 0 exactly, so its spectral convergence is 1 and
    its log-magnitudes sit at the 1e-7 floor), i.e. the baseline costs zero extra
    DFT passes instead of a second full multi-resolution sweep.

    pred and true are stacked into one [2, ...] batch so each resolution costs ONE
    framing + ONE DFT matmul instead of two — fewer, larger MXU dispatches (part of
    the measured 90 → ~55 ms downstream-test-step cut).

    Batches larger than ``batch_chunk`` pairs are processed sequentially with
    ``lax.map``, accumulating each loss's sufficient statistics — Σ(Mt−Mp)²,
    ΣMt², Σ|log Mt − log Mp| decompose exactly over batch chunks (spectral
    convergence is a global Frobenius ratio, reassembled from the totals). The
    unchunked form materializes the per-resolution DFT output for the whole
    batch at once: ~25 GB at the reference's downstream ``batch_size: 1024``
    (conf/audio_to_params/small.yaml:2) — a guaranteed OOM on a 16 GB chip.
    Chunking is exact up to fp association; zero-padded tail pairs contribute
    exactly zero to every statistic."""

    def mags(x, n_fft, hop, win):
        if method in ("matmul_bf16", "matmul_f32"):
            dtype = "f32_split" if method == "matmul_f32" else jnp.bfloat16
            return magnitude_stft_matmul(
                x, n_fft, hop_length=hop, win_length=win, compute_dtype=dtype
            )
        return jnp.abs(stft(x, n_fft=n_fft, hop_length=hop, win_length=win))

    pred2 = pred.reshape(-1, pred.shape[-1])
    true2 = true.reshape(-1, true.shape[-1])
    b = pred2.shape[0]

    def chunk_stats(pair):  # pair: [2, bc, T] → [n_res, 4] partial sums
        rows = []
        for n_fft, hop, win in resolutions:
            m = mags(pair, n_fft, hop, win)
            mp, mt = m[0], m[1]
            log_mt = jnp.log(jnp.maximum(mt, 1e-7))
            rows.append(
                jnp.stack(
                    [
                        jnp.sum((mt - mp) ** 2),
                        jnp.sum(mt**2),
                        jnp.sum(jnp.abs(log_mt - jnp.log(jnp.maximum(mp, 1e-7)))),
                        # silence-baseline log-mag stat: |Silence|=0 exactly, so
                        # log|silence| floors at log(1e-7) — no extra DFT needed
                        jnp.sum(jnp.abs(log_mt - jnp.log(jnp.float32(1e-7)))),
                    ]
                )
            )
        return jnp.stack(rows)

    if b <= batch_chunk:
        stats = chunk_stats(jnp.stack([pred2, true2]))
    else:
        n_chunks = -(-b // batch_chunk)
        pad = n_chunks * batch_chunk - b
        if pad:
            zeros = jnp.zeros((pad, pred2.shape[-1]), pred2.dtype)
            pred2 = jnp.concatenate([pred2, zeros])
            true2 = jnp.concatenate([true2, zeros])
        pairs = jnp.stack([pred2, true2]).reshape(
            2, n_chunks, batch_chunk, pred2.shape[-1]
        )
        stats = jnp.sum(jax.lax.map(chunk_stats, jnp.swapaxes(pairs, 0, 1)), axis=0)

    total = 0.0
    silence_total = 0.0
    for i, (n_fft, hop, win) in enumerate(resolutions):
        ssd, sst, sld, sld0 = stats[i, 0], stats[i, 1], stats[i, 2], stats[i, 3]
        # element count of the REAL (unpadded) batch for the log-magnitude mean
        n_frames = _stft_n_frames(pred.shape[-1], n_fft, hop)
        n_elems = b * (n_fft // 2 + 1) * n_frames
        sc = jnp.sqrt(ssd) / (jnp.sqrt(sst) + 1e-8)
        total = total + sc + sld / n_elems
        # silence predictor: ||Mt - 0||/||Mt|| = 1 exactly; log-mag vs the 1e-7 floor
        silence_total = silence_total + 1.0 + sld0 / n_elems
    loss = total / len(resolutions)
    if return_silence_baseline:
        return loss, silence_total / len(resolutions)
    return loss


def _stft_n_frames(t: int, n_fft: int, hop: int, center: bool = True) -> int:
    """Frame count of the STFT paths above (centered: T + 2·(n_fft//2) padded)."""
    if center:
        t = t + 2 * (n_fft // 2)
    return 1 + (t - n_fft) // hop


def mel_l1_loss(mel: MelSpectrogram, pred: jax.Array, true: jax.Array) -> jax.Array:
    """Mean |mel(pred) − mel(true)| (the reference's sketched downstream audio loss,
    audio_to_params.py:150-153). pred and true are stacked into one batch so the
    mel costs ONE framing + DFT matmul instead of two (same trick as
    multi_resolution_stft_loss)."""
    m = mel(jnp.stack([pred, true]))
    return jnp.mean(jnp.abs(m[0] - m[1]))

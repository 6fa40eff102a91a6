"""Pseudo-QMF polyphase analysis/synthesis filterbank, compiled to XLA.

Behavior contract follows the reference (reference: pqmf.py:9-55, itself vendored from
multiband-hifigan): a Kaiser-window FIR prototype lowpass is cosine-modulated into
``n_bands`` analysis filters H and synthesis filters G; analysis is a strided
cross-correlation (stride = n_bands, 'same'-ish padding of taps//2), synthesis is a
zero-stuffing upsample by n_bands (scaled by n_bands) followed by a cross-correlation
with G summing over bands. The pipeline uses n_bands=3 to fake RGB image channels
(reference: vicreg_audio_params.py:40, audioembed.py:38-41).

TPU notes: filter design happens once on the host with scipy (trace-time constants);
the runtime path is a single ``lax.conv_general_dilated`` per direction, which XLA maps
onto the MXU. Parity with the torch implementation is ≤1e-4 (tests/test_pqmf.py checks
against /root/reference/pqmf.py directly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sig


def design_pqmf_filters(
    n_bands: int, taps: int, cutoff: float, beta: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine-modulated filterbank design (reference math: pqmf.py:18-30).

    Returns (H, G), each [n_bands, taps + 1] float64.
    """
    proto = sig.firwin(taps + 1, cutoff, window=("kaiser", beta))
    k = np.arange(n_bands, dtype=np.float64)[:, None]
    t = np.arange(taps + 1, dtype=np.float64)[None, :]
    # NB: the reference centers the modulation at (taps - 1) / 2, not taps / 2
    # (acknowledged TODO at reference pqmf.py:26); kept for parity.
    mod = (2.0 * k + 1.0) * (np.pi / (2.0 * n_bands)) * (t - (taps - 1) / 2.0)
    phase = ((-1.0) ** k) * (np.pi / 4.0)
    analysis = 2.0 * proto * np.cos(mod + phase)
    synthesis = 2.0 * proto * np.cos(mod - phase)
    return analysis, synthesis


class PQMF:
    """Polyphase quadrature-mirror filterbank.

    ``analysis(x)``: [B, 1, T] → [B, n_bands, ceil(T / n_bands)]
    ``synthesis(x)``: [B, n_bands, T'] → [B, 1, T' * n_bands]
    """

    def __init__(
        self,
        n_bands: int = 4,
        taps: int = 62,
        cutoff: float = 0.15,
        beta: float = 9.0,
    ):
        self.n_bands = n_bands
        self.taps = taps
        self.cutoff = cutoff
        self.beta = beta
        h, g = design_pqmf_filters(n_bands, taps, cutoff, beta)
        w, left_pad = self._polyphase_synthesis_kernel(g)
        # Filters are kept as NUMPY constants and converted at call time: a PQMF may
        # be constructed inside one jit trace and used inside another (it is cached in
        # the audio tower), and jnp arrays born inside a trace would leak as tracers.
        # H: [out_ch = n_bands, in_ch = 1, K]; G: [out_ch = 1, in_ch = n_bands, K]
        self.H = np.asarray(h[:, None, :], dtype=np.float32)
        self.G = np.asarray(g[None, :, :], dtype=np.float32)
        self._synthesis_w = (np.asarray(w, dtype=np.float32), left_pad)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.analysis(x)

    def analysis(self, x: jax.Array, channels_last: bool = False) -> jax.Array:
        """[B, 1, T] → [B, n_bands, T/N], or [B, T/N, n_bands] with channels_last
        (the conv writes the band-last layout directly — no transpose copy, which
        matters when the bands feed an NHWC vision trunk)."""
        pad = self.taps // 2
        return jax.lax.conv_general_dilated(
            x,
            jnp.asarray(self.H, dtype=x.dtype),
            window_strides=(self.n_bands,),
            padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NHC" if channels_last else "NCH"),
        )

    def _polyphase_synthesis_kernel(self, g: np.ndarray) -> Tuple[np.ndarray, int]:
        """Decompose synthesis into a polyphase conv over the band-rate signal.

        The reference synthesis (pqmf.py:52-55) zero-stuffs each band by N (gain N,
        via conv_transpose1d with an identity filter) then runs a stride-1 conv with G
        over the N×-longer signal. That direct form compiles pathologically slowly on
        TPU (stride-1 conv over 529200 samples). Since the upsampled signal is zero at
        all non-multiples of N, output phase p only touches filter taps j ≡
        (taps//2 − p) mod N; regrouping gives N band-rate convolutions — expressed here
        as ONE conv with N output channels (one per phase) that are re-interleaved.
        Bit-exact (up to float assoc.) with the reference; verified ≤1e-4 in tests.

        Returns (W [N_phase, N_band, L], left_pad).
        """
        n, k = self.n_bands, self.taps + 1
        g = np.asarray(g, dtype=np.float64)  # [n_bands, K]
        center = self.taps // 2
        j0 = [(center - p) % n for p in range(n)]
        # per-phase temporal offsets of the first tap, in band-rate samples
        o = [(p + j0[p] - center) // n for p in range(n)]
        o_min = min(o)
        lens = [(-(-(k - j0[p]) // n)) + (o[p] - o_min) for p in range(n)]
        L = max(lens)
        W = np.zeros((n, n, L))
        for p in range(n):
            taps_p = g[:, j0[p]::n] * n  # [n_bands, L_p]
            shift = o[p] - o_min
            W[p, :, shift : shift + taps_p.shape[1]] = taps_p
        return W, -o_min

    def synthesis(self, x: jax.Array) -> jax.Array:
        b, n, t = x.shape
        assert n == self.n_bands
        w, left_pad = self._synthesis_w
        L = w.shape[-1]
        phases = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w, dtype=x.dtype),
            window_strides=(1,),
            padding=[(left_pad, L - 1 - left_pad)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )  # [B, n_phases, T']
        return jnp.swapaxes(phases, 1, 2).reshape(b, 1, t * n)

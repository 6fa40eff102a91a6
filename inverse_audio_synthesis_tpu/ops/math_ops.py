"""Cross-backend-reproducible elementwise math.

``exp2_accurate`` exists because oscillator pitch goes through ``exp2`` (MIDI →
Hz) and then through ~1e5 radians of accumulated phase over a 4-second buffer: a
relative frequency error ε becomes an absolute phase error of ε × 2π·f·t — at
12.5 kHz and 4 s, 3e5·ε radians. The measured builtin ``jnp.exp2`` on TPU is a
~5e-6-accurate approximation, and the XLA and Mosaic (Pallas) lowerings are
*different* approximations that disagree by up to 1.26e-6 — enough to drift the
fused-kernel waveform ~0.4 rad (5% RMS) from the jnp path on the same chip
(behavioral contract: the reference's torchsynth-on-device correctness,
/root/reference/vicreg_audio_params.py:114).

This version uses only exactly-rounded IEEE primitives (mul/add/floor/bitcast),
so any two backends evaluate the identical rounding sequence, and its absolute
accuracy (~1e-7 rel, ~2 ulps) is ~50× better than either builtin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# degree-6 least-squares fit of 2^f on [-0.5, 0.5], relative-error weighted
# (fit in fp64; fp32 Horner evaluation measured at max rel err 1.04e-7)
_EXP2_COEFFS = (
    0.00015332508,
    0.0013394702,
    0.009618491,
    0.055503424,
    0.24022648,
    0.6931472,
    1.0,
)


def exp2_accurate(x: jax.Array) -> jax.Array:
    """2**x for fp32 ``x`` in (-126, 127), identical across XLA and Mosaic.

    Range reduction x = n + f with n integer and f in [-0.5, 0.5]; 2^f by a
    degree-6 Horner polynomial (exactly-rounded mul/add only); 2^n by direct
    exponent-field construction (shift + bitcast — exact).

    Implicit compiler contract: cross-backend bit-identity holds only while
    neither XLA nor Mosaic contracts the Horner ``p * f + c`` into an FMA
    (contraction changes the rounding sequence). Neither does today — measured
    on-chip — but nothing in the IR pins it; the tripwire is the on-chip parity
    gate (``bench.py::assert_tpu_pallas_parity``) plus tests/test_math_ops.py.
    If a regression ever appears, rebuild the polynomial from explicitly
    non-fusable primitives (e.g. split each step's product into exact hi/lo
    parts before the add).
    """
    x = x.astype(jnp.float32)
    n = jnp.floor(x + 0.5)
    f = x - n
    p = jnp.float32(_EXP2_COEFFS[0])
    for c in _EXP2_COEFFS[1:]:
        p = p * f + jnp.float32(c)
    scale = jax.lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    return p * scale


# ---------------------------------------------------------------------------
# Fast polynomial sin/cos/tanh for the audio-rate oscillators.
#
# The builtin transcendentals are the VPU cost center of the fused render
# kernel (one cos + one sincos pair + one tanh per audio sample × 176,400
# samples × batch). These replacements are (a) built from exactly-rounded
# mul/add/floor/select only, so — under the same no-FMA compiler contract as
# exp2_accurate above — XLA and Mosaic evaluate the identical rounding
# sequence (the builtins are *different* approximations per backend), and
# (b) a single short Horner chain instead of the builtins' generic
# full-range lowering.
#
# Domain: |x| ≤ _TRIG_MAX_ABS (4096). Both render paths wrap phase, so the
# oscillator arguments stay ≤ ~400 rad (render.py integrate_phase wraps
# offsets/carry mod 2π; ops/scan_ops.phase_cumsum wraps chunk offsets with
# chunk=128 → ≤ 128·dφmax + 2π ≈ 370 rad). Beyond the domain the quadrant
# index n no longer multiplies the Cody-Waite π/2 terms exactly and accuracy
# degrades gracefully (as does builtin fp32 trig: ulp(4096 rad) ≈ 2.4e-4).
# ---------------------------------------------------------------------------

_TRIG_MAX_ABS = 4096.0

_TWO_OVER_PI = 0.6366197723675814
# Cody-Waite split of π/2: HI/MID carry ≤12 significant mantissa bits each, so
# n·HI and n·MID are EXACT for integer |n| ≤ 2^12; LO carries the residual.
_PIO2_HI = 1.5703125  # 0x3FC90000
_PIO2_MID = 4.837512969970703e-04  # 0x39FDA000
_PIO2_LO = 7.549790126404332e-08  # fp32(π/2 − HI − MID); residual ~2e-15

# fdlibm k_sinf/k_cosf minimax coefficients (double-precision values; fp32
# Horner evaluation measured ≤ 2 ulp on |q| ≤ π/4 — tests/test_math_ops.py)
_SIN_COEFFS = (
    2.7183114939898219064e-06,
    -1.98393348360966317347e-04,
    8.3333293858894631756e-03,
    -1.66666666416265235595e-01,
)
_COS_COEFFS = (
    2.43904487962774090654e-05,
    -1.38867637746099294692e-03,
    4.16666233237390631894e-02,
    -4.99999997251031003120e-01,
)


def _sincos_reduced(x: jax.Array):
    """Quadrant reduction + kernel polynomials. Returns (s, c, k) where
    sin(x)/cos(x) are quadrant-selections of (s, c) by k = n mod 4."""
    x = x.astype(jnp.float32)
    n = jnp.floor(x * jnp.float32(_TWO_OVER_PI) + jnp.float32(0.5))
    q = x - n * jnp.float32(_PIO2_HI)
    q = q - n * jnp.float32(_PIO2_MID)
    q = q - n * jnp.float32(_PIO2_LO)  # q in [-π/4, π/4]
    z = q * q
    ps = jnp.float32(_SIN_COEFFS[0])
    for c in _SIN_COEFFS[1:]:
        ps = ps * z + jnp.float32(c)
    s = q + q * (z * ps)  # sin(q)
    pc = jnp.float32(_COS_COEFFS[0])
    for c in _COS_COEFFS[1:]:
        pc = pc * z + jnp.float32(c)
    c = jnp.float32(1.0) + z * pc  # cos(q)
    k = n.astype(jnp.int32) & 3  # two's-complement & handles negative n
    return s, c, k


def sincos_fast(x: jax.Array):
    """(sin x, cos x) for fp32 ``|x| ≤ 4096``, identical across XLA and Mosaic.

    One shared quadrant reduction feeds both outputs — cheaper than two builtin
    calls wherever both are needed (the square↔saw oscillator). Same implicit
    no-FMA compiler contract as ``exp2_accurate``; the on-chip parity gate
    (``bench.py::assert_tpu_pallas_parity``) is the tripwire.
    """
    s, c, k = _sincos_reduced(x)
    sin = jnp.where(k == 0, s, jnp.where(k == 1, c, jnp.where(k == 2, -s, -c)))
    cos = jnp.where(k == 0, c, jnp.where(k == 1, -s, jnp.where(k == 2, -c, s)))
    return sin, cos


def sin_fast(x: jax.Array) -> jax.Array:
    s, c, k = _sincos_reduced(x)
    return jnp.where(k == 0, s, jnp.where(k == 1, c, jnp.where(k == 2, -s, -c)))


def cos_fast(x: jax.Array) -> jax.Array:
    s, c, k = _sincos_reduced(x)
    return jnp.where(k == 0, c, jnp.where(k == 1, -s, jnp.where(k == 2, -c, s)))


def tanh_fast(x: jax.Array) -> jax.Array:
    """tanh(x) via ``exp2_accurate``: (2^(2x·log2e) − 1) / (2^(2x·log2e) + 1).

    |x| is clipped to 43 (tanh(43) == 1 in fp32: 1 − tanh ≈ 4e-38). Cross-backend
    identity additionally assumes both backends lower fp32 division identically —
    division is not in exp2's mul/add-only set; the parity gate is the tripwire.
    """
    x = jnp.clip(x.astype(jnp.float32), -43.0, 43.0)
    y = exp2_accurate(x * jnp.float32(2.885390081777927))  # 2·log2(e)
    return (y - 1.0) / (y + 1.0)

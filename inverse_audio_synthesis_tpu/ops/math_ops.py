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

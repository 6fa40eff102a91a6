"""Pure-functional DSP modules for the Voice synthesizer.

Each function maps batched natural-unit parameters ([B]-shaped leaves) to batched
control-rate ([B, Tc]) or audio-rate ([B, Ta]) signals. Semantics reconstruct the
torchsynth-1.0 modules the reference instantiates through ``Voice``
(reference: vicreg_audio_params.py:86-94); see synth/voice.py for the wiring.

Everything here is elementwise/VPU work plus time-axis ``cumsum`` for oscillator
phase — XLA fuses the chains; the Pallas fused-render kernel in ops/pallas builds on
the same math.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.ops.math_ops import (
    cos_fast,
    exp2_accurate,
    sincos_fast,
    tanh_fast,
)
from inverse_audio_synthesis_tpu.ops.scan_ops import linear_upsample, phase_cumsum

_EPS = 1e-9


def midi_to_hz(midi):
    # exp2_accurate, not jnp.exp2: the builtin's XLA and Mosaic lowerings are
    # different ~5e-6 approximations, which de-syncs the fused Pallas render from
    # this path by ~0.4 rad of phase over 4 s (see ops/math_ops.py)
    return 440.0 * exp2_accurate((midi - 69.0) / 12.0)


# ---------------------------------------------------------------------------
# ADSR envelope (control rate)
# ---------------------------------------------------------------------------


def _ramp(
    n_samples: int,
    rate: float,
    duration,  # [B] seconds
    alpha,  # [B]
    start=None,  # [B] seconds or None
    inverse: bool = False,
):
    """Clamped linear ramp 0→1 over ``duration`` starting at ``start``, raised to
    ``alpha``. With ``inverse``, the ramp is flipped to 1→0 wherever duration > 0."""
    t = jnp.arange(n_samples, dtype=jnp.float32)[None, :]
    dur = (duration * rate)[:, None]
    st = 0.0 if start is None else (start * rate)[:, None]
    y = jnp.clip((t - st) / jnp.maximum(dur, _EPS), 0.0, 1.0)
    if inverse:
        # always 1−y: with the eps-guarded division a zero duration becomes an
        # instant 1→0 step at `start`, the correct dur→0+ limit (a dur>0 special
        # case here inverted the decay/release envelope for ~12% of random voices)
        y = 1.0 - y
    # safe power: grad of 0**alpha w.r.t. alpha is 0*log(0) = NaN; mask the base
    safe = jnp.where(y > 0.0, y, 1.0)
    return jnp.where(y > 0.0, jnp.power(safe, alpha[:, None]), 0.0)


def adsr_envelope(
    params: Dict[str, jax.Array],  # attack, decay, sustain, release, alpha — each [B]
    note_on_duration,  # [B] seconds
    n_samples: int,
    control_rate: float,
) -> jax.Array:
    """Attack/decay/release composed multiplicatively (each phase in [0,1]).

    attack is clipped to the note length and decay to the remainder, so the envelope
    reaches sustain before note-off and releases from wherever it is.
    """
    attack = jnp.minimum(params["attack"], note_on_duration)
    decay = jnp.minimum(
        jnp.maximum(note_on_duration - params["attack"], 0.0), params["decay"]
    )
    alpha = params["alpha"]

    attack_sig = _ramp(n_samples, control_rate, attack, alpha)
    sustain = params["sustain"][:, None]
    decay_sig = (1.0 - sustain) * _ramp(
        n_samples, control_rate, decay, alpha, start=attack, inverse=True
    ) + sustain
    release_sig = _ramp(
        n_samples, control_rate, params["release"], alpha, start=note_on_duration,
        inverse=True,
    )
    return attack_sig * decay_sig * release_sig


# ---------------------------------------------------------------------------
# LFO (control rate)
# ---------------------------------------------------------------------------

LFO_SHAPES = ("sin", "tri", "saw", "rsaw", "sqr")
# exponent sharpening the shape-selection weights (torchsynth uses e)
_LFO_SELECTION_EXPONENT = float(jnp.e)


def lfo(
    params: Dict[str, jax.Array],  # frequency, mod_depth, initial_phase, 5 shapes — [B]
    rate_mod: jax.Array,  # [B, Tc]
    control_rate: float,
) -> jax.Array:
    """Low-frequency oscillator: frequency modulated by ``rate_mod``, phase integrated
    by cumsum, five unit-range shapes blended by normalized, exponent-sharpened
    selection weights. Output in [0, 1]."""
    freq = params["frequency"][:, None]
    freq = jnp.maximum(freq + params["mod_depth"][:, None] * rate_mod, 0.0)
    argument = jnp.cumsum(2.0 * jnp.pi * freq / control_rate, axis=1)
    argument = argument + params["initial_phase"][:, None]

    cos = (jnp.cos(argument + jnp.pi) + 1.0) / 2.0
    square = (jnp.sign(jnp.cos(argument + jnp.pi)) + 1.0) / 2.0
    saw = jnp.mod(argument, 2.0 * jnp.pi) / (2.0 * jnp.pi)
    rsaw = 1.0 - saw
    tri = 2.0 * saw
    tri = jnp.where(tri > 1.0, 2.0 - tri, tri)
    shapes = jnp.stack([cos, tri, saw, rsaw, square], axis=1)  # [B, 5, Tc]

    weights = jnp.stack([params[s] for s in LFO_SHAPES], axis=1)  # [B, 5]
    weights = jnp.power(weights, _LFO_SELECTION_EXPONENT)
    weights = weights / jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), _EPS)
    return jnp.einsum("bs,bst->bt", weights, shapes)


# ---------------------------------------------------------------------------
# VCOs (audio rate)
# ---------------------------------------------------------------------------


def _vco_argument(
    midi_f0,  # [B]
    tuning,  # [B]
    mod_depth,  # [B]
    initial_phase,  # [B]
    pitch_mod: jax.Array,  # [B, Ta] audio-rate modulation in [0, 1]-ish
    sample_rate: float,
) -> Tuple[jax.Array, jax.Array]:
    """Pitch modulation happens in MIDI space, clamped to [0, 127], then converted to
    Hz and integrated into instantaneous phase. Returns (argument, control_as_midi)."""
    control_as_midi = jnp.clip(
        (midi_f0 + tuning)[:, None] + mod_depth[:, None] * pitch_mod, 0.0, 127.0
    )
    freq = midi_to_hz(control_as_midi)
    # audio-rate phase integration: chunked prefix on the MXU with 2π-wrapped offsets —
    # unwrapped phase reaches ~1e5 rad where fp32 trig loses all accuracy.
    # dphi as freq × one precomputed constant (single rounding), the exact op order
    # the Pallas kernel uses, so both paths see bit-identical phase increments
    argument = phase_cumsum((2.0 * jnp.pi / sample_rate) * freq)
    return argument + initial_phase[:, None], control_as_midi


def sine_vco(params, midi_f0, pitch_mod, sample_rate) -> jax.Array:
    arg, _ = _vco_argument(
        midi_f0, params["tuning"], params["mod_depth"], params["initial_phase"],
        pitch_mod, sample_rate,
    )
    # math_ops polynomial cos: bit-identical to the fused Pallas kernel's
    # oscillator (the XLA and Mosaic builtin lowerings differ); arg is the
    # 2π-wrapped chunked prefix (≤ ~235 rad), inside cos_fast's ±4096 domain
    return cos_fast(arg)


def squaresaw_partials(midi_f0, tuning, mod_depth) -> jax.Array:
    """Band-limit partials constant from the maximum possible pitch (shared by the
    jnp oscillator and the fused Pallas kernel's scalar prep)."""
    max_pitch = midi_f0 + tuning + jnp.maximum(mod_depth, 0.0)
    max_f0 = midi_to_hz(max_pitch)
    denom = max_f0 * jnp.log10(jnp.maximum(max_f0, 1.0 + 1e-6))
    return 12000.0 / jnp.maximum(denom, _EPS)


def square_saw_vco(params, midi_f0, pitch_mod, sample_rate) -> jax.Array:
    """Band-limit-aware square↔saw morph: tanh-saturated sine with a partials
    constant chosen from the maximum possible pitch, blended toward saw by ``shape``."""
    arg, _ = _vco_argument(
        midi_f0, params["tuning"], params["mod_depth"], params["initial_phase"],
        pitch_mod, sample_rate,
    )
    partials = squaresaw_partials(midi_f0, params["tuning"], params["mod_depth"])
    shape = params["shape"][:, None]
    sin_a, cos_a = sincos_fast(arg)  # shared reduction; matches the Pallas kernel
    square = tanh_fast(jnp.pi * partials[:, None] * sin_a / 2.0)
    return (1.0 - shape / 2.0) * square * (1.0 + shape * cos_a)


# ---------------------------------------------------------------------------
# Noise / VCA / mixers / upsampling
# ---------------------------------------------------------------------------


def noise(key: jax.Array, batch_size: int, n_samples: int, row_offset=0) -> jax.Array:
    """Fixed white noise in [-1, 1). One key per row (fold_in by row index) so the
    realization of row i is invariant to batch size. ``row_offset`` (static or
    traced) shifts the row indices, letting a chunked caller reproduce rows
    ``offset..offset+batch_size`` of the equivalent un-chunked buffer."""
    def row(i):
        return jax.random.uniform(
            jax.random.fold_in(key, i), (n_samples,), minval=-1.0, maxval=1.0
        )

    return jax.vmap(row)(row_offset + jnp.arange(batch_size))


def vca(audio: jax.Array, control: jax.Array) -> jax.Array:
    """Voltage-controlled amplifier; amplitude control is non-negative."""
    return audio * jnp.maximum(control, 0.0)


def modulation_mixer(
    weights: jax.Array,  # [B, n_in, n_out] natural units (already curve-warped)
    signals: jax.Array,  # [B, n_in, Tc]
) -> jax.Array:  # [B, n_out, Tc]
    return jnp.einsum("bio,bit->bot", weights, signals)


def audio_mixer(levels: jax.Array, signals: jax.Array) -> jax.Array:
    """levels [B, n_in] · signals [B, n_in, Ta] → [B, Ta]."""
    return jnp.einsum("bi,bit->bt", levels, signals)


def upsample_control(control: jax.Array, n_audio_samples: int) -> jax.Array:
    """Linear interpolation from control rate to audio rate (half-pixel centers,
    matching torch F.interpolate(mode='linear', align_corners=False)); expressed as a
    fusable broadcast-lerp for integer ratios instead of a gather-based resize."""
    return linear_upsample(control, n_audio_samples)

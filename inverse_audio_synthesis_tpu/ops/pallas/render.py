"""Fused Pallas TPU kernel for the audio-rate half of the Voice render.

The jnp path (synth/voice.py:render_voice) materializes ~8 HBM-sized intermediates per
VCO branch (upsampled controls, MIDI curves, phase increments, phases, oscillator
outputs). This kernel computes the whole audio-rate graph — control upsampling, pitch
modulation, phase integration, both oscillators, VCAs, and the mixer — in ONE pass:
HBM traffic is one read of the noise buffer plus one write of the audio.

Structure (per batch-tile × time-block grid step; time blocks iterate sequentially so
oscillator phase carries across blocks in VMEM scratch):

    routed controls [Bt, 5, Tc+2] (edge-padded, whole signal in VMEM — ~280 KB)
      → per-segment linear interpolation to audio rate (static slicing, no gathers)
      → MIDI-space pitch mod + clip + exp2 (VPU)
      → phase integration: within-segment prefix via triangular MATMUL (MXU),
        per-segment totals via second triangular matmul, + running carry (scratch)
      → sine & band-limited square/saw oscillators (VPU transcendentals)
      → VCA envelopes + noise + 3-channel mix → audio block out

Constraints: sample_rate/control_rate must be exactly the integer upsample ratio
(audio_len == ratio × control_len) — true for the reference's 44100/441 = 100. Batch
is padded to the batch tile. Gradients: wrapped in jax.custom_vjp with the jnp path's
VJP as backward, so the kernel is safe under jax.grad.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inverse_audio_synthesis_tpu.ops.math_ops import (
    cos_fast,
    exp2_accurate,
    sincos_fast,
    tanh_fast,
)

BATCH_TILE = 32  # best measured at batch 128 (8: 8.1ms, 16: 7.1ms, 32: 6.7ms); 64 exceeds VMEM


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def fused_render_supported(batch: int, audio_len: int, control_len: int) -> bool:
    if control_len <= 0 or audio_len % control_len != 0:
        return False
    ratio = audio_len // control_len
    # _seg_for_ratio needs ratio in [2, 128] to build a lane-aligned segment block
    return 2 <= ratio <= 128


def _kernel(
    window_ref,  # [Bt, 1, 5, S + 2] edge-padded control window for this time block
    scal_ref,  # [Bt, 16] per-voice scalars (VMEM)
    noise_ref,  # [Bt, S, R] noise block
    out_ref,  # [Bt, S, R] audio block
    carry_ref,  # scratch [Bt, 128]: running phase per VCO (slots 0/1)
    *,
    seg_per_block: int,
    ratio: int,
    sample_rate: float,
):
    s, r = seg_per_block, ratio
    bt = out_ref.shape[0]
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    # interpolation weights for the r offsets within a segment (iota must be int on TPU)
    j = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, r), 2).astype(jnp.float32) + 0.5
    ) / r - 0.5  # [-0.5, 0.5)
    w = jnp.abs(j)
    use_prev = j < 0.0

    # window[k] == f[k0 + k - 1]: covers f[k0-1 .. k0+S] (windows built host-side so
    # the lane slice is static — Mosaic can't prove dynamic lane alignment)
    window = window_ref[:, 0]  # [Bt, 5, S+2]

    def upsampled(sig: int):
        f_prev = window[:, sig, 0:s][:, :, None]
        f_left = window[:, sig, 1 : s + 1][:, :, None]
        f_next = window[:, sig, 2 : s + 2][:, :, None]
        neighbor = jnp.where(use_prev, f_prev, f_next)
        return f_left * (1.0 - w) + neighbor * w  # [Bt, S, R]

    tri_r = jnp.triu(jnp.ones((r, r), jnp.float32))  # x @ tri_r = inclusive prefix
    tri_s = jnp.triu(jnp.ones((s, s), jnp.float32), k=1)  # strict: exclusive prefix

    def dot_f32_split(x, tri):
        """x @ tri at ~fp32 accuracy on the MXU. Mosaic lowers fp32 dots by
        truncating operands to bf16 and IGNORES precision=HIGHEST (measured: the
        on-chip parity gate fails identically with and without it), which costs
        ~0.4% relative per product — fatal for phase (totals reach 2π, so late
        segments drift ~0.2 rad). Split x = hi + lo with hi = bf16(x): hi's
        products against the 0/1 triangular matrix are EXACT (both operands
        bf16-representable, fp32 accumulation), and lo is ~2^-9 smaller so its own
        bf16 rounding is ~1e-5 relative — two cheap matmuls ≈ one fp32 matmul."""
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        dims = (((1,), (0,)), ((), ()))
        return jax.lax.dot_general(
            hi, tri, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(lo, tri, dims, preferred_element_type=jnp.float32)

    two_pi = 2.0 * jnp.pi

    def integrate_phase(pitch_mod, base_midi, mod_depth, slot):
        """Phase (mod 2π-equivalent) — offsets and carry are wrapped so fp32 trig
        stays accurate (unwrapped phase would reach ~1e5 rad)."""
        midi = jnp.clip(base_midi + mod_depth * pitch_mod, 0.0, 127.0)
        # exp2_accurate: bit-reproducible across XLA/Mosaic (the builtins are two
        # different ~5e-6 approximations — fatal across ~1e5 rad of phase)
        freq = 440.0 * exp2_accurate((midi - 69.0) / 12.0)
        dphi = (2.0 * jnp.pi / sample_rate) * freq  # [Bt, S, R]
        # Prefix sum on the MXU via split-precision dots (see dot_f32_split; the
        # wrapped totals reach 2π, so bf16-truncated products would drift the phase
        # of late segments by ~0.2 rad → ~5% waveform RMS, caught by bench.py's
        # on-chip parity gate — interpret-mode tests can't see MXU truncation).
        # The mean part of the prefix is (j+1)·mean, computed exactly elementwise;
        # the matmuls carry only the residual and the per-segment totals.
        mean_s = jnp.mean(dphi, axis=2, keepdims=True)  # [Bt, S, 1]
        delta = dphi - mean_s
        within_delta = dot_f32_split(delta.reshape(bt * s, r), tri_r).reshape(bt, s, r)
        ramp = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, r), 2).astype(jnp.float32) + 1.0
        )
        within = mean_s * ramp + within_delta
        totals = jnp.mod(within[:, :, r - 1], two_pi)  # [Bt, S]
        seg_offset = jnp.mod(
            dot_f32_split(totals, tri_s), two_pi
        )  # exclusive prefix over segments, wrapped
        carry = carry_ref[:, slot][:, None]
        phase = within + jnp.mod(seg_offset + carry, two_pi)[:, :, None]
        carry_ref[:, slot] = jnp.mod(
            carry_ref[:, slot] + jnp.mod(jnp.sum(totals, axis=1), two_pi), two_pi
        )
        return phase

    def col(i):
        return scal_ref[:, i][:, None, None]

    # accumulate sources one at a time to minimize live VMEM intermediates.
    # Oscillator trig/tanh use the math_ops polynomial versions: bit-identical
    # across XLA and Mosaic (the builtins are different approximations per
    # backend) and one shared quadrant reduction feeds VCO 2's sin+cos pair.
    # Phase is 2π-wrapped per segment (≤ ~185 rad), inside their ±4096 domain.
    # VCO 1: sine
    phase1 = integrate_phase(upsampled(0), col(0), col(1), 0) + col(2)
    mix = col(8) * cos_fast(phase1) * jnp.maximum(upsampled(1), 0.0)
    # VCO 2: square↔saw morph
    phase2 = integrate_phase(upsampled(2), col(3), col(4), 1) + col(5)
    shape = col(6)
    partials = col(7)
    sin2, cos2 = sincos_fast(phase2)
    square = tanh_fast(jnp.pi * partials * sin2 / 2.0)
    osc2 = (1.0 - shape / 2.0) * square * (1.0 + shape * cos2)
    mix = mix + col(9) * osc2 * jnp.maximum(upsampled(3), 0.0)
    # noise
    mix = mix + col(10) * noise_ref[:, :, :] * jnp.maximum(upsampled(4), 0.0)
    out_ref[:, :, :] = mix


def render_audio_fused(
    routed: jax.Array,  # [B, 5, Tc]
    scalars: jax.Array,  # [B, 16]
    noise: jax.Array,  # [B, Ta]
    sample_rate: float,
    interpret: bool = False,
) -> jax.Array:
    """Audio-rate render: returns [B, Ta]."""
    b, five, tc = routed.shape
    assert five == 5
    ta = noise.shape[-1]
    assert ta % tc == 0, (ta, tc)
    ratio = ta // tc

    # pad batch to the tile
    pad_b = (-b) % BATCH_TILE
    if pad_b:
        routed = jnp.concatenate([routed, jnp.zeros((pad_b, 5, tc), routed.dtype)], 0)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad_b, scalars.shape[1]), scalars.dtype)], 0
        )
        noise = jnp.concatenate([noise, jnp.zeros((pad_b, ta), noise.dtype)], 0)
    bp = b + pad_b

    # Mosaic wants the last block dim % 128 == 0: pick seg_per_block so that
    # seg_per_block*ratio is lane-aligned, then pad time up to the block grid
    # (44.1 kHz buffers are never 128-aligned; padded tail is sliced off).
    assert fused_render_supported(b, ta, tc), (b, ta, tc)
    seg_per_block = _seg_for_ratio(ratio)
    t_block = seg_per_block * ratio
    tc_padded = _round_up(tc, seg_per_block)
    ta_padded = tc_padded * ratio
    n_time_blocks = tc_padded // seg_per_block

    if ta_padded > ta:
        noise = jnp.concatenate(
            [noise, jnp.zeros((bp, ta_padded - ta), noise.dtype)], axis=-1
        )
    # Mosaic can't shape-cast across the lane dim in-kernel: hand the kernel 3-D
    # [B, segments, ratio] layouts and reshape outside
    noise3 = noise.reshape(bp, tc_padded, ratio)
    # edge-pad controls: +1 left (f[k-1]), +1 right (f[k+1]) plus segment-grid padding,
    # then materialize the per-block overlapping windows host-side ([B, nT, 5, S+2],
    # tiny) — in-kernel dynamic lane slices can't be proven 128-aligned by Mosaic
    right_pad = tc_padded - tc + 1
    routed_padded = jnp.concatenate(
        [routed[:, :, :1], routed]
        + [jnp.repeat(routed[:, :, -1:], right_pad, axis=-1)],
        axis=-1,
    )  # [B, 5, tc_padded + 2]
    windows = jnp.stack(
        [
            routed_padded[:, :, t * seg_per_block : t * seg_per_block + seg_per_block + 2]
            for t in range(n_time_blocks)
        ],
        axis=1,
    )  # [B, nT, 5, S+2]

    kernel = functools.partial(
        _kernel,
        seg_per_block=seg_per_block,
        ratio=ratio,
        sample_rate=float(sample_rate),
    )
    out = pl.pallas_call(
        kernel,
        grid=(bp // BATCH_TILE, n_time_blocks),
        in_specs=[
            pl.BlockSpec(
                (BATCH_TILE, 1, 5, seg_per_block + 2), lambda i, t: (i, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BATCH_TILE, 16), lambda i, t: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BATCH_TILE, seg_per_block, ratio), lambda i, t: (i, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BATCH_TILE, seg_per_block, ratio), lambda i, t: (i, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, tc_padded, ratio), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BATCH_TILE, 128), jnp.float32)],
        interpret=interpret,
    )(windows.astype(jnp.float32), scalars.astype(jnp.float32), noise3)
    return out.reshape(bp, ta_padded)[:b, :ta]


def _seg_for_ratio(ratio: int) -> int:
    """Smallest segment count S with S*ratio % 128 == 0 and S*ratio around 4-8k."""
    import math

    s = 128 // math.gcd(ratio, 128)
    # grow to a reasonable block size (≥ 4096 samples) for DMA efficiency
    while s * ratio < 4096:
        s *= 2
    return s

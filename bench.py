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
WARMUP_ITERS = 2
BENCH_ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from inverse_audio_synthesis_tpu.ops.stft import MelSpectrogram
    from inverse_audio_synthesis_tpu.synth import SynthConfig
    from inverse_audio_synthesis_tpu.synth.voice import (
        render_voice,
        sample_voice_params,
    )

    cfg = SynthConfig(batch_size=BATCH_SIZE)
    mel = MelSpectrogram(sample_rate=cfg.sample_rate, n_fft=1024, hop_length=512, n_mels=128)

    @jax.jit
    def step(batch_num):
        params01 = sample_voice_params(batch_num, cfg)
        audio = render_voice(params01, cfg)
        return mel(audio)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    for i in range(WARMUP_ITERS):
        step(i).block_until_ready()
    t0 = time.time()
    for i in range(WARMUP_ITERS, WARMUP_ITERS + BENCH_ITERS):
        step(i).block_until_ready()
    dt = (time.time() - t0) / BENCH_ITERS
    voices_per_sec = BATCH_SIZE / dt
    print(f"{dt * 1e3:.2f} ms / {BATCH_SIZE}-voice batch", file=sys.stderr)

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

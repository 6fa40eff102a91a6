#!/usr/bin/env python3
"""Generate the vendored test clip (assets/test_clip.wav) from the synth itself.

The reference vendors a 4-s music excerpt (daddy.wav) for its PQMF filter-range
diagnostic (reference: pretrain.py:29-48). This framework vendors a clip drawn
from its OWN data distribution — a deterministic mix of rendered Voice patches —
so a deployment without the reference checkout keeps the diagnostic, and the
diagnostic actually measures the filterbank on the audio it will see in training.

Run once; the output WAV is committed. Regenerate only if the synth changes:
    python tools/make_test_clip.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # reproducible regardless of the tunnel

from inverse_audio_synthesis_tpu.synth import SynthConfig
from inverse_audio_synthesis_tpu.synth.voice import render_voice, sample_voice_params
from inverse_audio_synthesis_tpu.utils.audio_io import write_wav

OUT = Path(__file__).resolve().parent.parent / (
    "inverse_audio_synthesis_tpu/assets/test_clip.wav"
)


def main() -> None:
    cfg = SynthConfig(batch_size=8, seed=42)
    params = sample_voice_params(1, cfg)  # batch 1: a train batch (batch 0 is test)
    audio = np.asarray(render_voice(params, cfg))  # [8, 176400], jnp reference path
    # mix four voices into one mono clip: spectrally dense enough to exercise all
    # three PQMF bands, amplitude-normalized to 0.9 full scale
    clip = audio[:4].sum(axis=0)
    clip = 0.9 * clip / np.abs(clip).max()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    write_wav(OUT, clip, cfg.sample_rate)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, {clip.shape[0]} samples)")


if __name__ == "__main__":
    main()

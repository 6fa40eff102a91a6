#!/usr/bin/env python
"""Sweep the fused render kernel's block geometry (BATCH_TILE × seg_per_block)
on the real chip and print a ms table.

The kernel's defaults (ops/pallas/render.py: BATCH_TILE=32, _seg_for_ratio's
>=4096-sample growth) were picked by hand in round 1; this sweeps both knobs
with the production shape (batch 128, 4 s @ 44.1 kHz, ratio 100) using the
docs/tpu.md timing methodology (>=20 iterations amortized per host fetch,
best-of-N trials on the pool-shared chip).

Usage: python tools/tune_render_block.py [batch] [iters] [trials]

Measured 2026-08-19 (b128, 20 iters/fetch, best-of-3): the defaults are the
optimum of the viable space — tile=32/seg=64 5.905 ms render-only; smaller
tiles/segments cost 2-11%; every config with block >= 12800 samples or
tile=64 fails remote compile (VMEM).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.ops.pallas import render as render_mod
from inverse_audio_synthesis_tpu.synth import modules
from inverse_audio_synthesis_tpu.synth.voice import (
    SynthConfig,
    render_voice_fused,
    sample_voice_params,
)
from inverse_audio_synthesis_tpu.utils.utils import enable_compile_cache


def time_config(params01, cfg, noise, iters, trials):
    # i perturbs the input each iteration (0-valued term — the render itself is
    # unchanged) so every dispatch is a fresh execution; the sync is a SCALAR
    # FETCH, not block_until_ready (unreliable through the tunnel — bench.py)
    fn = jax.jit(
        lambda p, n, i: jnp.sum(
            render_voice_fused(p + 0.0 * i, cfg, noise=n) ** 2
        )
    )
    float(fn(params01, noise, 0.0))  # compile + hard sync
    best = float("inf")
    k = 1
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [fn(params01, noise, float(k + j)) for j in range(iters)]
        float(outs[-1])
        k += iters
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    enable_compile_cache()
    cfg = SynthConfig(batch_size=batch)
    params01 = sample_voice_params(0, cfg)
    noise = modules.noise(
        jax.random.PRNGKey(cfg.noise_seed), batch, cfg.buffer_size
    )
    ratio = cfg.buffer_size // cfg.control_buffer_size
    base_seg = 128 // __import__("math").gcd(ratio, 128)  # lane-alignment minimum

    default_tile = render_mod.BATCH_TILE
    default_seg_fn = render_mod._seg_for_ratio
    results = []
    for tile in (8, 16, 32, 64):
        if batch % tile:
            continue
        for seg in (base_seg, base_seg * 2, base_seg * 4, base_seg * 8):
            render_mod.BATCH_TILE = tile
            render_mod._seg_for_ratio = lambda r, s=seg: s
            label = f"tile={tile:3d} seg={seg:4d} block={seg * ratio:6d}"
            try:
                ms = time_config(params01, cfg, noise, iters, trials)
                results.append((ms, label))
                print(f"{label}  {ms:8.3f} ms")
            except Exception as e:  # VMEM overflow etc. — report and continue
                print(f"{label}  FAILED: {type(e).__name__}: {str(e)[:120]}")
            finally:
                render_mod.BATCH_TILE = default_tile
                render_mod._seg_for_ratio = default_seg_fn
    if results:
        results.sort()
        print("\nbest:", results[0][1], f"{results[0][0]:.3f} ms")
        print(f"default (tile={default_tile}, seg={default_seg_fn(ratio)}):",
              next((f"{ms:.3f} ms" for ms, lbl in results
                    if f"tile={default_tile:3d} seg={default_seg_fn(ratio):4d}" in lbl),
                   "n/a"))


if __name__ == "__main__":
    main()

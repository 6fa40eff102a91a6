#!/usr/bin/env python
"""Op-class ablation of the fused render kernel: what actually bounds it?

The b128 roofline table (tools/roofline_table.py) shows the synth phase at
~25% of its HBM roofline bound — the bound that matters is on-chip compute,
not HBM traffic. This tool measures WHICH op class binds, two ways:

1. **Marginal cost by op class** (standalone kernel program, BATCH_TILE=16 —
   the standalone program's operand copies push tile-32 over the 16 MB
   scoped-VMEM limit; production programs compile fine at 32): stub each op
   class to identity and re-time. Measured 2026-08-19 on v5e (baseline
   5.84 ms render-only):

   | ablation                                   | ms   | saved |
   |--------------------------------------------|------|-------|
   | baseline                                   | 5.84 | —     |
   | tanh → identity                            | 5.89 | ~0    |
   | sin/cos → identity                         | 5.72 | 0.12  |
   | exp2 → affine                              | 5.58 | 0.26  |
   | ALL transcendentals → identity             | 5.49 | 0.35  |
   | phase-prefix MXU matmuls → identity        | 5.60 | 0.23  |
   | interp select+1 mul removed                | 5.27 | 0.56  |

2. **Production-shaped A/B** (sample + controls + kernel in one jit, the
   step's real geometry): a select-free interpolation rewrite and a
   mean/ramp-free phase prefix both measured 5.96 vs 5.95 ms baseline — no
   gain — and the mean/ramp-free prefix degrades fused-vs-jnp parity from
   max|Δ| 0.010 to 0.396 (the mean-ramp decomposition is load-bearing for
   phase accuracy; only the residual goes through the split-bf16 MXU dots).

Conclusion (recorded in BASELINE.md / docs/roofline_b128_r4.md): the kernel
is NOT bound by any single op class. The polynomial transcendentals
(ops/math_ops.py) pipeline on the VPU at near-zero marginal cost — the
round-4 builtin→polynomial swap already harvested that win (9.01→6.84 ms
synth+mel). What remains is the structural cost of evaluating a ~200-op
elementwise graph over 22.6 M samples with ~20 live [tile, S, R] VMEM
intermediates: VPU issue/VMEM-traffic bound in aggregate. Going faster
requires a different algorithm (fewer materialized audio-rate signals), not
micro-op tuning; the block geometry sweep (tools/tune_render_block.py) and
these ablations bracket the current design at within ~10% of its floor.

A third probe closed the geometry question: raising the Mosaic scoped-VMEM
limit via ``CompilerParams(vmem_limit_bytes=100MB)`` unlocks the tile-64/128
geometries the 16 MB default rejected — measured (production-shaped, b128):
tile32/seg64 5.98 ms (control), tile64/seg64 6.05, tile64/seg32 6.13,
tile128/seg32 6.06; seg=128/256 blocks crash the remote Mosaic compiler.
Bigger tiles don't help, so the default geometry + default limit stand.

Usage: python tools/ablate_render_kernel.py   (requires the real TPU)
"""
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.synth import SynthConfig
from inverse_audio_synthesis_tpu.synth import modules as synth_modules
from inverse_audio_synthesis_tpu.synth.voice import (
    _fused_scalars,
    compute_controls,
    render_voice,
    sample_voice_params,
)
from inverse_audio_synthesis_tpu.utils.utils import enable_compile_cache

RENDER_PY = Path(__file__).resolve().parent.parent / (
    "inverse_audio_synthesis_tpu/ops/pallas/render.py"
)

# --- op-class stubs (marginal-cost pass) -------------------------------------
IDENT_SUBS = {
    "tanh": [("tanh_fast(", "(lambda _x: _x)(")],
    "trig": [
        # sincos first: "cos_fast(" is a substring of "sincos_fast("
        ("sincos_fast(", "(lambda _x: (_x, _x))("),
        ("cos_fast(", "(lambda _x: _x)("),
    ],
    "exp2": [("exp2_accurate(", "(lambda _x: _x + 1.0)(")],
    "matmul": [
        (
            "within_delta = dot_f32_split(delta.reshape(bt * s, r), tri_r)"
            ".reshape(bt, s, r)",
            "within_delta = delta",
        ),
        (
            "seg_offset = jnp.mod(\n            dot_f32_split(totals, tri_s), two_pi\n"
            "        )",
            "seg_offset = jnp.mod(totals, two_pi)",
        ),
    ],
    "interp": [
        (
            """        neighbor = jnp.where(use_prev, f_prev, f_next)
        return f_left * (1.0 - w) + neighbor * w  # [Bt, S, R]""",
            """        neighbor = f_next
        return f_left + neighbor * w  # ablation: select + one mul removed""",
        )
    ],
}


def make_variant(name, subs, tile):
    src = RENDER_PY.read_text()
    for old, new in subs:
        assert old in src, (name, old[:60])
        src = src.replace(old, new)
    src = src.replace("BATCH_TILE = 32", f"BATCH_TILE = {tile}")
    mod = types.ModuleType(f"render_{name}")
    mod.__dict__["__file__"] = f"/tmp/render_{name}.py"
    exec(compile(src, f"/tmp/render_{name}.py", "exec"), mod.__dict__)
    return mod


def main():
    enable_compile_cache()
    b = 128
    cfg = SynthConfig(batch_size=b)
    noise = jax.jit(synth_modules.noise, static_argnums=(1, 2))(
        jax.random.PRNGKey(cfg.noise_seed), b, cfg.buffer_size
    )
    params01 = jax.jit(lambda n: sample_voice_params(n, cfg))(0)
    p, routed, midi = jax.jit(lambda q: compute_controls(q, cfg))(params01)
    scal = jax.jit(lambda q: _fused_scalars(*(lambda t: (t[0], t[2]))(
        compute_controls(q, cfg))))(params01)
    jax.block_until_ready((noise, routed, scal))

    def timeit(fn, *args, iters=20, trials=3):
        float(jnp.sum(fn(*args)))
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            outs = [fn(*args) for _ in range(iters)]
            float(jnp.sum(outs[-1]))
            best = min(best, (time.time() - t0) / iters)
        return best * 1e3

    print("== marginal cost by op class (standalone kernel, tile=16) ==")
    for name, subs in [("baseline", [])] + list(IDENT_SUBS.items()):
        try:
            mod = make_variant(name, subs, tile=16)
            ms = timeit(
                jax.jit(
                    lambda r_, s_, n_, m=mod: m.render_audio_fused(
                        r_, s_, n_, float(cfg.sample_rate)
                    )
                ),
                routed, scal, noise,
            )
            print(f"  {name:12s} {ms:7.2f} ms")
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"  {name:12s} FAILED: {type(e).__name__}: {str(e)[:90]}")

    print("== production-shaped baseline (sample+controls+kernel, tile=32) ==")
    mod = make_variant("prod", [], tile=32)

    def render_with(q, nz):
        pp, rr, mm = compute_controls(q, cfg)
        return mod.render_audio_fused(
            rr, _fused_scalars(pp, mm), nz, float(cfg.sample_rate)
        )

    ms = timeit(jax.jit(render_with), params01, noise)
    print(f"  production-shaped {ms:7.2f} ms")

    # parity reference (same contract as bench.py's gate)
    cfg32 = SynthConfig(batch_size=32)
    p32 = jax.jit(lambda n: sample_voice_params(n, cfg32))(12345)
    n32 = jax.jit(synth_modules.noise, static_argnums=(1, 2))(
        jax.random.PRNGKey(cfg32.noise_seed), 32, cfg32.buffer_size
    )

    def render32(q, nz):
        pp, rr, mm = compute_controls(q, cfg32)
        return mod.render_audio_fused(
            rr, _fused_scalars(pp, mm), nz, float(cfg32.sample_rate)
        )

    fused = np.asarray(jax.jit(render32)(p32, n32))
    ref = np.asarray(jax.jit(lambda q: render_voice(q, cfg32, noise=n32))(p32))
    rel = float(np.sqrt(np.mean((fused - ref) ** 2)) / np.sqrt(np.mean(ref**2)))
    print(f"  parity vs jnp: max|d|={np.abs(fused - ref).max():.4f} relRMS={rel:.5f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-phase measured-vs-roofline table for the VICReg train step.

Times each phase of the b128 train step in isolation (amortized ≥20 iters per
host fetch — the tunneled chip's scalar sync costs ~26 ms, see docs/tpu.md),
pulls FLOPs / bytes-accessed from XLA's compiled-program cost analysis, and
prints a markdown table of measured time vs the phase's own roofline bound
  bound = max(flops / MXU_peak, bytes / HBM_peak)
so "measured ≈ bound" reads as saturation and the gap column shows where
traffic/FLOP headroom actually remains.

Caveats printed with the table:
- XLA "bytes accessed" counts fusion-internal traffic that may stay in
  VMEM/registers, so t_bytes is an UPPER bound on the true traffic floor —
  utilization numbers are optimistic for bandwidth-bound phases. A second
  column gives the hand-derived minimal traffic (params at their stored dtype
  + kernel I/O) where we can state it.
- The Pallas synth render is on-chip compute-bound, not MXU/HBM-bound; its
  MXU roofline is meaningless. Per the op-class ablation
  (tools/ablate_render_kernel.py) no single op class dominates: stubbing ALL
  transcendentals to identity recovers only ~6% of the render time (the
  polynomial sin/cos/tanh pipeline at near-zero marginal cost) — the floor is
  the aggregate VPU-issue/VMEM cost of the whole elementwise graph.

Usage: python tools/roofline_table.py [batch_size]
"""
import itertools
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask, maybe_bf16_grads
from inverse_audio_synthesis_tpu.utils.config import load_config

PEAKS = {  # device kind prefix -> (bf16 FLOP/s, HBM bytes/s)
    "TPU v5 lite": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
}


def device_peaks():
    kind = jax.devices()[0].device_kind
    for k, peaks in PEAKS.items():
        if kind.startswith(k):
            return peaks
    return (None, None)


def cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"cost analysis unavailable: {e!r}", file=sys.stderr)
        return 0.0, 0.0


def timeit(fn, sync, iters=20, trials=3):
    """Best-of-trials amortized ms/call. `sync` materializes one scalar of fn's
    output (the tunneled device's block_until_ready is not a reliable sync)."""
    sync(fn())  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def tree_bytes(tree):
    return sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(tree))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    peak_flops, peak_bw = device_peaks()
    print(f"backend: {jax.default_backend()}  kind: {jax.devices()[0].device_kind}  "
          f"peaks: {peak_flops/1e12:.0f} TFLOP/s bf16, {peak_bw/1e9:.0f} GB/s", file=sys.stderr)

    mesh = create_mesh(devices=jax.devices()[:1])
    cfg = load_config(overrides=[f"vicreg.batch_size={batch}"])
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()

    param_b = tree_bytes(state.params)
    grads_bf16 = cfg.get("precision") == "bf16" and cfg.get("grads_bf16", False)
    grad_b = param_b // 2 if grads_bf16 else param_b
    audio_b = batch * task.synth.buffer_size * 4
    print(f"params: {param_b/1e6:.0f} MB fp32, grads {'bf16' if grads_bf16 else 'fp32'} "
          f"{grad_b/1e6:.0f} MB, audio {audio_b/1e6:.0f} MB", file=sys.stderr)

    counter = itertools.count(1)

    # --- phase programs --------------------------------------------------------
    synth_j = jax.jit(task._synthesize)
    audio, params01 = synth_j(0, task._noise)
    jax.block_until_ready(audio)

    @jax.jit
    def fwd(params, batch_stats, audio, params01):
        x, y = task.model.apply(
            {"params": params, "batch_stats": batch_stats}, audio, params01, train=False
        )
        return x, y

    x, y = fwd(state.params, state.batch_stats, audio, params01)

    @jax.jit
    def loss_fwd(x, y):
        return task._losses(x, y)[0]

    dropout_key = jax.random.PRNGKey(0)

    @jax.jit
    def fwd_bwd(params, batch_stats, audio, params01):
        def loss_fn(p):
            (xx, yy), mutated = task.model.apply(
                {"params": p, "batch_stats": batch_stats},
                audio, params01, train=True,
                rngs={"dropout": dropout_key}, mutable=["batch_stats"],
            )
            return task._losses(xx, yy)[0], mutated

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, maybe_bf16_grads(cfg, grads)

    loss0, grads = fwd_bwd(state.params, state.batch_stats, audio, params01)

    @partial(jax.jit, donate_argnums=(0,))
    def opt_apply(st, grads):
        return st.apply_gradients(grads=grads, batch_stats=st.batch_stats)

    def full():
        n = next(counter)
        st, m = task.train_step(main.state, n)
        main.state = st
        return m["vicreg/train/loss"]

    main.state = state

    scalar = lambda o: float(jnp.asarray(o).ravel()[0] if hasattr(o, "ravel") else jnp.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])

    rows = []

    def phase(name, fn, jitted, args, min_bytes=None, note=""):
        ms = timeit(fn, scalar)
        fl, by = cost(jitted, *args) if jitted is not None else (0.0, 0.0)
        t_fl = fl / peak_flops * 1e3 if peak_flops else 0.0
        t_by = by / peak_bw * 1e3 if peak_bw else 0.0
        t_min = (min_bytes / peak_bw * 1e3) if min_bytes else None
        bound = max(t_fl, t_by)
        rows.append((name, ms, fl, by, t_fl, t_by, t_min, bound, note))
        print(f"  {name}: {ms:.2f} ms", file=sys.stderr)

    phase("synth (sample+render)",
          lambda: synth_j(next(counter) % 7, task._noise),
          synth_j, (0, task._noise),
          min_bytes=2 * audio_b,  # kernel reads the noise buffer, writes audio
          note="on-chip compute-bound; no single op class dominates "
               "(tools/ablate_render_kernel.py)")
    phase("model fwd (towers+projector)",
          lambda: fwd(state.params, state.batch_stats, audio, params01),
          fwd, (state.params, state.batch_stats, audio, params01),
          min_bytes=param_b + audio_b,
          note="reads fp32 params once + audio")
    phase("vicreg loss fwd", lambda: loss_fwd(x, y), loss_fwd, (x, y),
          note="two embeddim^2 covariance dots dominate")
    phase("model+loss fwd+bwd",
          lambda: fwd_bwd(state.params, state.batch_stats, audio, params01),
          fwd_bwd, (state.params, state.batch_stats, audio, params01),
          min_bytes=2 * param_b + grad_b + audio_b,
          note="params read fwd+dgrad, grads written once")
    # optimizer phase mutates state; time it with fresh grads each call via donation
    def opt_fn():
        main.opt_state = opt_apply(main.opt_state, grads)
        return main.opt_state.opt_state.count
    # a deep copy: opt_apply DONATES its input state, and the original `state`
    # buffers are still needed by the FULL-step phase below
    main.opt_state = jax.tree_util.tree_map(jnp.copy, state)
    phase("LARS apply (fused, 2-pass)", opt_fn, None, (),
          min_bytes=2 * (param_b + grad_b) + param_b,
          note="pass1 reads w+g; pass2 reads w+g writes w")
    phase("FULL train step", full, None, (),
          note="parts include ~1.5 ms dispatch each; full step pays it once")

    hdr = ("| phase | measured ms | XLA GFLOP | XLA GB | t_flops ms | t_bytes ms "
           "| t_minbytes ms | roofline bound ms | bound/measured |")
    print(hdr)
    print("|" + "---|" * 9)
    for name, ms, fl, by, t_fl, t_by, t_min, bound, note in rows:
        tm = f"{t_min:.2f}" if t_min is not None else "—"
        util = f"{100*bound/ms:.0f}%" if bound else "—"
        print(f"| {name} | {ms:.2f} | {fl/1e9:.1f} | {by/1e9:.2f} | {t_fl:.2f} "
              f"| {t_by:.2f} | {tm} | {bound:.2f} | {util} |")
    for name, *_, note in rows:
        if note:
            print(f"- {name}: {note}")


if __name__ == "__main__":
    main()

"""Serving export: the trained inference surfaces as portable StableHLO artifacts.

The reference has no deployment story — its closest artifact is a shape-print
smoke test (reference: heareval.py:10-19) and a raw ``torch.load("vicreg.pth")``
state dict consumed by a stale notebook (evaluate_audio_representations.py:127).
A production TPU serving stack wants the inference functions frozen into
compiler-portable artifacts instead of live Python model code: ``jax.export``
serializes a jitted function as versioned StableHLO, loadable years later (the
serialization carries a calling-convention version) by any JAX/PJRT runtime —
including a C++ server via the PJRT C API — and callable without this package.

Exported surfaces (weights ride as ARGUMENTS, not baked constants: the
artifacts stay ~KBs-to-MBs and the serving runtime feeds weights it restored
from the orbax checkpoint — baking the 143 M-param full config in would make a
~600 MB constant blob per artifact):

- ``embed_audio``:    (variables, audio [B, 1, T]) → [B, dim]      — the HEAR /
  retrieval embedding surface (reference: heareval.py:14-15)
- ``predict_params``: (frozen, head_vars, audio [B, 1, T]) → [B, nparams] — the
  downstream inverse-synthesis surface (reference: audio_to_params.py:224)
- ``render``:         (params01 [B, nparams]) → audio [B, T]       — the
  synthesizer itself (the jnp path: pure XLA, portable to CPU/GPU/TPU; the
  Pallas-fused path is a single-platform kernel, so serving renders that need
  it should run this package live instead)

Cross-platform: pass ``platforms=("tpu", "cpu")`` to lower once for several
backends (jax.export's multi-platform lowering); the default is the host's
platform.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _abstractify(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def _variables(state) -> dict:
    return {"params": state.params, "batch_stats": state.batch_stats}


def export_embed_audio(
    task, state, batch: int, platforms: Optional[Sequence[str]] = None
) -> jax_export.Exported:
    """Export the audio tower: (variables, audio [batch, 1, T]) → [batch, dim]."""
    model = task.model

    def fn(variables, audio):
        return model.apply(variables, audio, train=False, method=model.audio_repr)

    audio_spec = jax.ShapeDtypeStruct((batch, 1, task.synth.buffer_size), jnp.float32)
    return jax_export.export(jax.jit(fn), platforms=platforms)(
        _abstractify(_variables(state)), audio_spec
    )


def export_predict_params(
    task, state, batch: int, platforms: Optional[Sequence[str]] = None
) -> jax_export.Exported:
    """Export the inverse-synthesis head: (frozen vicreg variables, head
    variables, audio [batch, 1, T]) → predicted params01 [batch, nparams]."""

    def fn(frozen, head_vars, audio):
        audio_repr = task._audio_repr(frozen, audio)
        return task.head.apply(head_vars, audio_repr.astype(jnp.float32), train=False)

    audio_spec = jax.ShapeDtypeStruct((batch, 1, task.synth.buffer_size), jnp.float32)
    return jax_export.export(jax.jit(fn), platforms=platforms)(
        _abstractify(task.frozen), _abstractify(_variables(state)), audio_spec
    )


def export_render(
    synth_config, batch: int, platforms: Optional[Sequence[str]] = None
) -> jax_export.Exported:
    """Export the synthesizer: (params01 [batch, nparams]) → audio [batch, T].

    Uses the pure-XLA jnp render (portable across platforms); the fixed-seed
    noise buffer is regenerated inside the program from the config's noise seed
    (bit-identical to the cached-buffer path — rows are position-keyed)."""
    from inverse_audio_synthesis_tpu.synth.voice import VOICE_PARAM_SPECS, render_voice

    def fn(params01):
        return render_voice(params01, synth_config)

    spec = jax.ShapeDtypeStruct((batch, len(VOICE_PARAM_SPECS)), jnp.float32)
    return jax_export.export(jax.jit(fn), platforms=platforms)(spec)


def save_exported(exp: jax_export.Exported, path) -> None:
    Path(path).write_bytes(bytes(exp.serialize()))


def load_exported(path) -> jax_export.Exported:
    """Load a serialized artifact; call it via ``loaded.call(*args)`` (traceable —
    composes under jit/vmap on the serving side)."""
    return jax_export.deserialize(bytearray(Path(path).read_bytes()))


def write_manifest(out_dir, cfg, entries: dict) -> None:
    """A small JSON manifest next to the artifacts so a serving runtime can
    discover shapes/rates without deserializing the StableHLO."""
    manifest = {
        "sample_rate": int(cfg.torchsynth.rate),
        "buffer_size_seconds": float(cfg.torchsynth.buffer_size_seconds),
        "dim": int(cfg.dim),
        "nparams": int(cfg.nparams),
        "artifacts": entries,
    }
    (Path(out_dir) / "manifest.json").write_text(json.dumps(manifest, indent=2))

#!/usr/bin/env python3
"""Export the trained inference surfaces as StableHLO serving artifacts.

Loads the vicreg (and optionally downstream-head) checkpoints, then writes
``embed_audio.stablehlo``, ``render.stablehlo``, ``predict_params.stablehlo``
(when a head checkpoint exists) plus ``manifest.json`` into ``export_dir``.
Weights are NOT baked in — the serving runtime restores them from the orbax
checkpoint and passes them as call arguments (see serve/export.py).

Usage (hydra-style overrides, same config surface as the other CLIs):
    python tools/export_model.py +export_dir=runs/export +export_batch=128 \
        +export_platforms=tpu,cpu vicreg_checkpoint=runs/checkpoints/vicreg
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from inverse_audio_synthesis_tpu.utils.config import load_config


def app(cfg) -> None:
    import jax

    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg.platform)

    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
    from inverse_audio_synthesis_tpu.serve import (
        export_embed_audio,
        export_predict_params,
        export_render,
        save_exported,
        write_manifest,
    )
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
    from inverse_audio_synthesis_tpu.train.downstream import AudioToParamsTask
    from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask
    from inverse_audio_synthesis_tpu.utils.utils import enable_compile_cache

    enable_compile_cache()
    out_dir = Path(cfg.get("export_dir", "runs/export"))
    out_dir.mkdir(parents=True, exist_ok=True)
    batch = int(cfg.get("export_batch", 128))
    platforms = cfg.get("export_platforms")
    if isinstance(platforms, str):
        platforms = tuple(p for p in platforms.split(",") if p)

    mesh = create_mesh(cfg.mesh.data, cfg.mesh.model)
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    run_dir = Path(cfg.get("run_dir", "runs"))
    vicreg_dir = cfg.get("vicreg_checkpoint") or str(run_dir / "checkpoints" / "vicreg")
    vicreg_ckpt = CheckpointManager(vicreg_dir)
    if vicreg_ckpt.latest_step() is not None:
        state = vicreg_ckpt.restore(state)
        print(f"loaded vicreg checkpoint step {vicreg_ckpt.latest_step()}")
    else:
        print(f"WARNING: no vicreg checkpoint under {vicreg_dir}; exporting random init")

    entries = {}

    exp = export_embed_audio(task, state, batch, platforms)
    save_exported(exp, out_dir / "embed_audio.stablehlo")
    entries["embed_audio"] = {
        "in": f"(variables, audio[{batch},1,{task.synth.buffer_size}] f32)",
        "out": f"[{batch},{cfg.dim}] f32",
        "platforms": list(exp.platforms),
    }
    print(f"exported embed_audio for platforms {exp.platforms}")

    exp = export_render(task.synth, batch, platforms)
    save_exported(exp, out_dir / "render.stablehlo")
    entries["render"] = {
        "in": f"(params01[{batch},{cfg.nparams}] f32)",
        "out": f"[{batch},{task.synth.buffer_size}] f32",
        "platforms": list(exp.platforms),
    }
    print(f"exported render for platforms {exp.platforms}")

    head_dir = cfg.get("downstream_checkpoint") or str(
        run_dir / "checkpoints" / "audio_to_params"
    )
    head_ckpt = CheckpointManager(head_dir)
    if head_ckpt.latest_step() is not None:
        ds_task = AudioToParamsTask(cfg, mesh, task, state)
        head_state = head_ckpt.restore(ds_task.init_state())
        print(f"loaded downstream checkpoint step {head_ckpt.latest_step()}")
        exp = export_predict_params(ds_task, head_state, batch, platforms)
        save_exported(exp, out_dir / "predict_params.stablehlo")
        entries["predict_params"] = {
            "in": f"(frozen, head_vars, audio[{batch},1,{ds_task.synth.buffer_size}] f32)",
            "out": f"[{batch},{cfg.nparams}] f32",
            "platforms": list(exp.platforms),
        }
        print(f"exported predict_params for platforms {exp.platforms}")
    else:
        print(f"no downstream checkpoint under {head_dir}; skipping predict_params")

    write_manifest(out_dir, cfg, entries)
    print(f"wrote {out_dir}/manifest.json")


if __name__ == "__main__":
    app(load_config(overrides=sys.argv[1:]))

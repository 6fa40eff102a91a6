#!/usr/bin/env python3
"""HEAR-style embedding-API smoke test (reference surface: heareval.py:10-19).

Loads the vicreg checkpoint and runs the audio backbone on random audio, printing the
output shape — the minimal public embedding API (audio in → [B, dim] out).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from inverse_audio_synthesis_tpu.utils.config import load_config


def app(cfg) -> None:
    import jax

    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg.platform)

    from inverse_audio_synthesis_tpu.utils.utils import enable_compile_cache

    enable_compile_cache()  # tunnel compile RTTs dominate CLI startup; IAS_NO_COMPILE_CACHE=1 opts out

    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
    from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask

    mesh = create_mesh(cfg.mesh.data, cfg.mesh.model)
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    run_dir = Path(cfg.get("run_dir", "runs"))
    ckpt_dir = cfg.get("vicreg_checkpoint") or str(run_dir / "checkpoints" / "vicreg")
    ckpt = CheckpointManager(ckpt_dir)
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"loaded vicreg checkpoint step {ckpt.latest_step()}")
    audio = jax.random.uniform(
        jax.random.PRNGKey(0), (4, 1, task.synth.buffer_size), minval=-1.0, maxval=1.0
    )
    emb = task.embed_audio(state, audio)
    print(tuple(emb.shape))

    # the full HEAR API surface (exceeds the reference's shape-print stub):
    # scene embeddings + 50 ms-hop timestamp embeddings on a 2.5-window clip
    from inverse_audio_synthesis_tpu.eval.hear import (
        HearModel,
        get_scene_embeddings,
        get_timestamp_embeddings,
    )

    model = HearModel(
        task=task,
        state=state,
        sample_rate=cfg.torchsynth.rate,
        scene_embedding_size=cfg.dim,
        timestamp_embedding_size=cfg.dim,
    )
    clip = jax.random.uniform(
        jax.random.PRNGKey(1),
        (2, int(2.5 * task.synth.buffer_size)),
        minval=-1.0,
        maxval=1.0,
    )
    scene = get_scene_embeddings(clip, model)
    ts_emb, ts = get_timestamp_embeddings(clip, model)
    print(
        f"scene {tuple(scene.shape)}; timestamps {tuple(ts_emb.shape)} "
        f"at {float(ts[0, 1] - ts[0, 0]):.1f} ms hop"
    )


if __name__ == "__main__":
    app(load_config(overrides=sys.argv[1:]))

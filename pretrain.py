#!/usr/bin/env python3
"""VICReg pretraining CLI (reference surface: pretrain.py:51-129).

Usage mirrors the reference's hydra CLI:
    python pretrain.py [vicreg=fast] [vicreg.optim.name=sgd] [dim=64] ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from inverse_audio_synthesis_tpu.utils.config import load_config


def app(cfg) -> None:
    import jax

    # the baked sitecustomize pins jax_platforms=axon,cpu; allow overriding from the
    # config (e.g. platform=cpu for local smoke runs)
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg.platform)

    from inverse_audio_synthesis_tpu.utils.utils import enable_compile_cache

    enable_compile_cache()  # tunnel compile RTTs dominate CLI startup; IAS_NO_COMPILE_CACHE=1 opts out

    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
    from inverse_audio_synthesis_tpu.train.loop import Trainer
    from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask
    from inverse_audio_synthesis_tpu.train.runsetup import runsetup
    from inverse_audio_synthesis_tpu.utils.logging import MetricsLogger
    from inverse_audio_synthesis_tpu.utils.utils import git_sha

    split = runsetup(cfg)
    mesh = create_mesh(cfg.mesh.data, cfg.mesh.model)
    print(f"devices: {jax.devices()}  mesh: {dict(mesh.shape)}")

    from inverse_audio_synthesis_tpu.utils.profiling import enable_nan_debugging
    from inverse_audio_synthesis_tpu.utils.summary import (
        filter_range_stats,
        summarize_params,
    )

    if cfg.get("detect_anomaly"):
        enable_nan_debugging()

    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    # startup model summary (reference prints torchinfo summaries, pretrain.py:63-78)
    print(summarize_params(state.params, max_depth=2))

    logger = MetricsLogger(
        run_dir=cfg.get("run_dir", "runs"),
        config={"git_sha": git_sha, **cfg.to_dict()},
        use_wandb=cfg.get("log") == "wand",
        run_name="pretrain-" + __import__("time").strftime("%Y%m%d-%H%M%S"),
    )
    checkpoint = CheckpointManager(
        directory=str(Path(cfg.get("run_dir", "runs")) / "checkpoints" / "vicreg"),
        every_n_steps=cfg.vicreg.checkpoint_every_nbatches,
    )
    trainer = Trainer(
        task,
        split,
        logger=logger,
        checkpoint=checkpoint,
        limit_train_batches=cfg.vicreg.get("limit_train_batches"),
        limit_val_batches=cfg.vicreg.get("limit_val_batches"),
        val_check_interval=cfg.vicreg.get("val_check_interval"),
        log_every=cfg.get("log_every", 50),
        steps_per_dispatch=cfg.get("steps_per_dispatch", 1),
    )
    # PQMF filter-range diagnostic on a real clip (working version of the
    # reference's dead plot_filter_range, pretrain.py:29-48). The clip is vendored
    # in-repo (tools/make_test_clip.py renders it from the synth's own data
    # distribution); the reference checkout's daddy.wav is only a fallback.
    import inverse_audio_synthesis_tpu

    clip_path = (
        Path(inverse_audio_synthesis_tpu.__file__).parent / "assets" / "test_clip.wav"
    )
    if not clip_path.exists():
        clip_path = Path("/root/reference/daddy.wav")
    if clip_path.exists():
        from inverse_audio_synthesis_tpu.utils.audio_io import read_wav

        clip, _ = read_wav(clip_path)
        logger.log(filter_range_stats(clip.mean(axis=1)[:176400]))

    start = checkpoint.latest_step()
    if start:
        try:
            state = checkpoint.restore(state)
            print(f"resuming from checkpoint step {start}")
        except Exception as e:
            # e.g. a checkpoint written by an older code version with a different
            # opt-state structure — train from scratch instead of dying
            print(f"WARNING: could not restore checkpoint step {start} ({e!r}); "
                  "starting fresh")
            start = None
    try:
        if cfg.get("profile_dir"):
            from inverse_audio_synthesis_tpu.utils.profiling import trace

            with trace(cfg.profile_dir):  # xprof trace of the whole fit
                trainer.fit(state, start_step=start or 0)
            print(f"profiler trace written to {cfg.profile_dir}")
        else:
            trainer.fit(state, start_step=start or 0)
    finally:
        # flush logs for ctrl-C (KeyboardInterrupt) and crashes too, not just the
        # clean and SIGTERM-preempted exits
        logger.finish()
    if trainer.interrupted is not None:
        # EX_TEMPFAIL: a restart supervisor must re-run (checkpoint saved; rerunning
        # this command auto-resumes), not read a preempted run as success
        print(f"preempted by signal {trainer.interrupted}; checkpoint saved")
        sys.exit(75)


if __name__ == "__main__":
    app(load_config(overrides=sys.argv[1:]))

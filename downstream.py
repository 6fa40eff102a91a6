#!/usr/bin/env python3
"""Downstream inverse-synthesis CLI (reference surface: downstream.py:20-70).

Loads the pretrained VICReg checkpoint, trains the AudioRepresentationToParams head,
then runs the test pass with resynthesis + audio logging.

    python downstream.py [vicreg_checkpoint=<dir>] [audio_to_params.batch_size=...] ...
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
    from inverse_audio_synthesis_tpu.train.downstream import AudioToParamsTask
    from inverse_audio_synthesis_tpu.train.loop import Trainer
    from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask
    from inverse_audio_synthesis_tpu.train.runsetup import runsetup
    from inverse_audio_synthesis_tpu.utils.logging import MetricsLogger
    from inverse_audio_synthesis_tpu.utils.utils import git_sha

    split = runsetup(cfg)
    mesh = create_mesh(cfg.mesh.data, cfg.mesh.model)

    # load the frozen pretrain state (reference: downstream.py:29 hardcodes
    # "vicreg.ckpt"; here the directory is configurable)
    run_dir = Path(cfg.get("run_dir", "runs"))
    vicreg_dir = cfg.get("vicreg_checkpoint") or str(run_dir / "checkpoints" / "vicreg")
    pretrain_task = VicregPretrainTask(cfg, mesh)
    vicreg_state = pretrain_task.init_state()
    vicreg_ckpt = CheckpointManager(vicreg_dir)
    if vicreg_ckpt.latest_step() is not None:
        vicreg_state = vicreg_ckpt.restore(vicreg_state)
        print(f"loaded vicreg checkpoint step {vicreg_ckpt.latest_step()}")
    else:
        print(f"WARNING: no vicreg checkpoint under {vicreg_dir}; using random towers")

    task = AudioToParamsTask(cfg, mesh, pretrain_task, vicreg_state)
    state = task.init_state()

    logger = MetricsLogger(
        run_dir=str(run_dir),
        config={"git_sha": git_sha, **cfg.to_dict()},
        use_wandb=cfg.get("log") == "wand",
        run_name="downstream-" + __import__("time").strftime("%Y%m%d-%H%M%S"),
    )
    checkpoint = CheckpointManager(
        directory=str(run_dir / "checkpoints" / "audio_to_params"),
        every_n_steps=cfg.audio_to_params.checkpoint_every_nbatches,
    )
    trainer = Trainer(
        task,
        split,
        logger=logger,
        checkpoint=checkpoint,
        limit_train_batches=cfg.audio_to_params.get("limit_train_batches"),
        val_check_interval=None,  # reference fits on train only (downstream.py:58-61)
        log_every=cfg.get("log_every", 50),
        steps_per_dispatch=cfg.get("steps_per_dispatch", 1),
    )
    # auto-resume from the head's own last checkpoint (preemption recovery, same
    # behavior as the pretrain CLI; the reference had none beyond save_last)
    start = checkpoint.latest_step()
    if start:
        try:
            state = checkpoint.restore(state)
            print(f"resuming downstream training from step {start}")
        except Exception as e:
            print(f"WARNING: could not restore checkpoint step {start} ({e!r}); "
                  "starting fresh")
            start = None
    try:
        if cfg.get("profile_dir"):
            from inverse_audio_synthesis_tpu.utils.profiling import trace

            with trace(cfg.profile_dir):  # xprof trace of the whole fit
                state = trainer.fit(state, start_step=start or 0)
            print(f"profiler trace written to {cfg.profile_dir}")
        else:
            state = trainer.fit(state, start_step=start or 0)
        if trainer.interrupted is not None:
            # preempted: don't burn the grace period on a test pass over a
            # half-trained head; exit EX_TEMPFAIL so a supervisor reruns
            # (auto-resumes from last)
            print(f"preempted by signal {trainer.interrupted}; checkpoint saved")
            sys.exit(75)

        # test pass with resynthesis (reference: downstream.py:63,
        # audio_to_params.py:238-273)
        import numpy as np

        from inverse_audio_synthesis_tpu.synth.voice import VOICE_PARAM_SPECS

        per_param_rows, per_param_base_rows = [], []
        scalar_rows = []  # per-test-batch scalar metrics → mean±std error bars
        for i in range(split.sizes.test):
            batch_num = split.test_batch_num(i)
            metrics, true_audio, pred_audio = task.test_step(state, batch_num)
            per_param_rows.append(
                np.asarray(metrics.pop("audio_to_params/test/param_mae_per_param"))
            )
            per_param_base_rows.append(
                np.asarray(
                    metrics.pop("audio_to_params/baseline/param_mae_per_param_const05")
                )
            )
            scalars = {k: float(v) for k, v in metrics.items()}
            scalar_rows.append(scalars)
            logger.log(scalars)
            task.log_audio_triplets(logger, true_audio, pred_audio, batch_idx=i)
        if len(scalar_rows) > 1:
            # mean±std across test batches: a floor-beating claim decided by one
            # batch has no error bar (set ntest_batches >= 8 for headline numbers;
            # the reference's conf/config.yaml:31 default of 1 is kept for parity)
            summary = {}
            for k in scalar_rows[0]:
                vals = np.asarray([r[k] for r in scalar_rows])
                summary[f"{k}/mean"] = float(vals.mean())
                summary[f"{k}/std"] = float(vals.std(ddof=1))
            logger.log(summary)
            print(f"test metrics over {len(scalar_rows)} batches (mean ± std):")
            for k in scalar_rows[0]:
                print(f"  {k}: {summary[f'{k}/mean']:.4f} ± {summary[f'{k}/std']:.4f}")
        # per-parameter MAE breakdown: which of the 78 params the head actually
        # learned (identifiable ones should be far below the chance floor; the
        # matching per-param constant-0.5 floor is written alongside)
        per_param = np.mean(per_param_rows, axis=0)
        per_param_base = np.mean(per_param_base_rows, axis=0)
        csv_path = Path(logger.dir) / "param_mae_per_param.csv"
        with open(csv_path, "w") as f:
            f.write("module,name,mae,mae_const05_baseline\n")
            for spec, mae, base in zip(VOICE_PARAM_SPECS, per_param, per_param_base):
                f.write(f"{spec.module},{spec.name},{mae:.6f},{base:.6f}\n")
        order = np.argsort(per_param)
        below = int(np.sum(per_param < per_param_base))
        print(f"per-param MAE written to {csv_path}")
        print(f"params below their chance floor: {below}/{len(per_param)}")
        print("best-learned params:")
        for j in order[:8]:
            s = VOICE_PARAM_SPECS[j]
            print(f"  {s.module}.{s.name}: {per_param[j]:.4f} "
                  f"(chance {per_param_base[j]:.4f})")
    finally:
        # flush logs for ctrl-C (KeyboardInterrupt) and crashes too
        logger.finish()


if __name__ == "__main__":
    app(load_config(overrides=sys.argv[1:]))

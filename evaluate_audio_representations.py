#!/usr/bin/env python3
"""NN-retrieval evaluation CLI (reference surface: evaluate_audio_representations.py).

Embeds a 16-sound query set, then streams candidate batches, tracking each query's
nearest neighbor; improvements are logged as (true, silence, match) audio clips.

    python evaluate_audio_representations.py retrieval.n_batches=100 ...
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

    from inverse_audio_synthesis_tpu.eval.retrieval import RetrievalEvaluator
    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
    from inverse_audio_synthesis_tpu.train.pretrain import (
        VicregPretrainTask,
        synth_config_from_cfg,
    )
    from inverse_audio_synthesis_tpu.utils.logging import MetricsLogger

    mesh = create_mesh(cfg.mesh.data, cfg.mesh.model)
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    run_dir = Path(cfg.get("run_dir", "runs"))
    ckpt_dir = cfg.get("vicreg_checkpoint") or str(run_dir / "checkpoints" / "vicreg")
    ckpt = CheckpointManager(ckpt_dir)
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"loaded vicreg checkpoint step {ckpt.latest_step()}")

    # reference: TEST_BATCH_SIZE=16 queries, PREDICT_BATCH_SIZE=1024 candidates
    # (evaluate_audio_representations.py:21-23)
    test_bs = cfg.get_dotted("retrieval.test_batch_size", 16)
    predict_bs = cfg.get_dotted("retrieval.predict_batch_size", 1024)
    n_batches = cfg.get_dotted("retrieval.n_batches", 100)

    def embed(variables, audio):
        return task.model.apply(
            variables, audio, train=False, method=task.model.embed_audio
        )

    logger = MetricsLogger(
        run_dir=str(run_dir),
        config=cfg.to_dict(),
        run_name="retrieval-" + __import__("time").strftime("%Y%m%d-%H%M%S"),
    )
    evaluator = RetrievalEvaluator(
        embed_fn=embed,
        variables={"params": state.params, "batch_stats": state.batch_stats},
        query_synth=synth_config_from_cfg(cfg, test_bs),
        candidate_synth=synth_config_from_cfg(cfg, predict_bs),
        inner_chunk=cfg.get_dotted("retrieval.inner_chunk", 128),
    )
    # end-to-end eval-correctness gate before streaming millions of candidates:
    # the query params rendered through the CANDIDATE pipeline must sit at
    # distance ~0 from the stored query embeddings (same renderer, same
    # position-keyed noise) — aborts loudly if the two paths ever drift apart
    evaluator.assert_planted_queries_found()
    print("planted-query check OK (query/candidate pipelines consistent)")
    result = evaluator.run(
        n_batches,
        logger=logger,
        sample_rate=cfg.torchsynth.rate,
        artifact_dir=str(run_dir / "retrieval"),
    )
    if not result["completed"]:
        # preempted: state saved; rerunning this command resumes. Don't log partial
        # distances as the final metric or exit 0 under a restart supervisor.
        logger.finish()
        print(
            f"preempted after {result['batches_done']}/{n_batches} candidate "
            "batches; state saved — rerun to resume"
        )
        sys.exit(75)
    print("final per-query min distances:", result["best_dist"].round(4).tolist())
    print(
        "NN param-MAE (chance floor 0.333):",
        result["nn_param_mae"].round(4).tolist(),
        f"mean {float(result['nn_param_mae'].mean()):.4f}",
    )
    print(f"convergence artifacts: {run_dir / 'retrieval'}/convergence.{{csv,png}}")
    logger.log(
        {
            "retrieval/mean_min_dist": float(result["best_dist"].mean()),
            # param-space error of the audio-space NN: comparable across
            # checkpoints (embedding distances are not) and a non-parametric
            # inverse-synthesis baseline (chance floor 1/3)
            "retrieval/mean_nn_param_mae": float(result["nn_param_mae"].mean()),
        }
    )
    logger.finish()


if __name__ == "__main__":
    app(load_config(overrides=sys.argv[1:]))

#!/usr/bin/env python3
"""Probe the frozen projected-param-embedding's train-vs-eval BN discriminability.

The downstream `embedding` objective is MSE in the frozen projected param-embedding
space (reference: audio_to_params.py:218-229). That space only carries signal if
DIFFERENT parameter vectors map to DIFFERENT embeddings under the BN mode the task
uses. The reference runs the frozen module in eval mode (`self.vicreg.eval()`,
audio_to_params.py:185,212-213) — i.e. BN running averages.

Measured on this framework's campaign checkpoints (2026-08-19, CPU probe, 8 random
param rows):

    pretrain    train-mode row-MSE   eval-mode row-MSE
    b128 r3          0.206              6.7e-4
    b512             0.579              1.3e-7
    b1024            0.290              4.3e-8

Eval-mode discriminability collapses by 3-7 orders of magnitude and worsens with
pretrain batch (LARS LR scales linearly with batch): the embedding geometry VICReg
optimizes lives in train-mode batch statistics, and the BN train/eval gap swallows
it. Consequence: the `embedding` head trained against the b1024 pretrain is
degenerate (loss pinned at ~8e-8 from step 0, all 78 params at chance). The
`frozen_bn: batch` knob (conf/audio_to_params/small.yaml) restores train-mode
geometry for the frozen towers.

Usage: python tools/probe_frozen_bn.py <ckpt_dir> [<ckpt_dir> ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
    from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask
    from inverse_audio_synthesis_tpu.utils.config import load_config

    cfg = load_config(overrides=["vicreg.batch_size=8"])
    task = VicregPretrainTask(cfg, create_mesh(1, 1))
    state = task.init_state()
    p = jax.random.uniform(jax.random.PRNGKey(0), (8, cfg.nparams))
    for ckdir in sys.argv[1:]:
        ck = CheckpointManager(ckdir)
        if ck.latest_step() is None:
            print(f"{ckdir}: no checkpoint")
            continue
        st = ck.restore(state)
        frozen = {"params": st.params, "batch_stats": st.batch_stats}
        et, _ = task.model.apply(
            frozen, p, train=True, method=task.model.embed_params,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
        )
        ee = task.model.apply(frozen, p, train=False, method=task.model.embed_params)
        et = np.asarray(et, np.float32)
        ee = np.asarray(ee, np.float32)
        print(
            f"{ckdir} (step {ck.latest_step()}): "
            f"train-mode row-MSE {((et[0] - et[1]) ** 2).mean():.3e}  "
            f"eval-mode row-MSE {((ee[0] - ee[1]) ** 2).mean():.3e}  "
            f"(eval emb std {ee.std():.3f})"
        )


if __name__ == "__main__":
    main()

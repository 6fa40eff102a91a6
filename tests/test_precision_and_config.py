"""bf16 precision path + synth-config invariants."""

import numpy as np
import pytest

from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
from inverse_audio_synthesis_tpu.synth import SynthConfig
from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask

from test_train import tiny_cfg


def test_reproducible_requires_128():
    SynthConfig(batch_size=128, reproducible=True)
    with pytest.raises(ValueError):
        SynthConfig(batch_size=16, reproducible=True)


def test_bf16_train_step():
    cfg = tiny_cfg(precision="bf16")
    mesh = create_mesh(data=8, model=1)
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    state, metrics = task.train_step(state, 0)
    loss = float(metrics["vicreg/train/loss"])
    assert np.isfinite(loss) and loss > 0
    # params remain fp32 even when compute is bf16
    import jax

    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == np.float32

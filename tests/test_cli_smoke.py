"""CLI surface smoke test: the pretrain entry point runs end-to-end as a subprocess
(tiny config, CPU, 2 steps) — locks the user-facing command-line contract."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_pretrain_cli(tmp_path):
    cmd = [
        sys.executable,
        str(REPO / "pretrain.py"),
        "platform=cpu",
        "vicreg=fast",
        "vicreg.mlp='64-%d'",
        "vicreg.batch_size=8",
        "vicreg.limit_train_batches=2",
        "vicreg.val_check_interval=0",
        "vicreg.checkpoint_every_nbatches=0",
        "dim=32",
        "embeddim=64",
        "image.height=64",
        "image.width=64",
        f"torchsynth.buffer_size_seconds={3 * 64 * 64 / 44100}",
        "num_batches=1000",
        f"run_dir={tmp_path}",
        "log_every=1",
    ]
    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8", "PATH": "/usr/bin:/bin"}
    import os

    env.update({k: v for k, v in os.environ.items() if k not in env})
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    runs = list(tmp_path.glob("pretrain-*/metrics.jsonl"))
    assert runs, "no metrics written"
    lines = [json.loads(l) for l in open(runs[0])]
    assert any("vicreg/train/loss" in l for l in lines)
    # save_last checkpoint written at end of fit
    assert (tmp_path / "checkpoints" / "vicreg" / "last").exists()


TINY = [
    "platform=cpu",
    "vicreg=fast",
    "vicreg.mlp='64-%d'",
    "vicreg.batch_size=8",
    "audio_to_params.batch_size=8",
    "dim=32",
    "embeddim=64",
    "image.height=64",
    "image.width=64",
    f"torchsynth.buffer_size_seconds={3 * 64 * 64 / 44100}",
    "num_batches=1000",
    "ntest_batches=1",
]


def _run(script, *extra, tmp_path):
    import os

    cmd = [sys.executable, str(REPO / script), *TINY, f"run_dir={tmp_path}", *extra]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc


@pytest.mark.slow
def test_downstream_heareval_retrieval_clis(tmp_path):
    # downstream without a checkpoint warns and trains against random towers
    proc = _run(
        "downstream.py",
        "audio_to_params.limit_train_batches=2",
        "audio_to_params.checkpoint_every_nbatches=0",
        tmp_path=tmp_path,
    )
    assert list(tmp_path.glob("downstream-*/audio/*.wav")), "no audio triplets logged"

    proc = _run("heareval.py", tmp_path=tmp_path)
    assert "(4, 32)" in proc.stdout  # [B, dim] embedding shape

    proc = _run(
        "evaluate_audio_representations.py",
        "retrieval.test_batch_size=4",
        "retrieval.predict_batch_size=8",
        "retrieval.n_batches=2",
        tmp_path=tmp_path,
    )
    assert "final per-query min distances" in proc.stdout

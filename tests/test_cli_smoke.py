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

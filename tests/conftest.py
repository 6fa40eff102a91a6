"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test process — pytest imports
this conftest before collecting test modules, which is early enough as long as no other
conftest/plugin imports jax at a higher level.
"""

import os
import sys
from pathlib import Path

# The ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests must run
# on a virtual 8-device CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = Path("/root/reference")

# The jaxtyping pytest plugin imports jax before this conftest runs, so the env var
# alone is too late — update the live config too (backends initialize lazily, so this
# takes effect as long as no array op has run yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache across suite runs (~15-20% off the wall time; tracing
# still dominates, so the win is bounded)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def has_reference() -> bool:
    return REFERENCE_DIR.exists()


def load_reference_module(name: str):
    """Import a module file from the read-only reference repo (for parity tests)."""
    import importlib.util

    path = REFERENCE_DIR / f"{name}.py"
    if not path.exists():
        pytest.skip(f"reference module {name} unavailable")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def reference_dir():
    if not has_reference():
        pytest.skip("/root/reference not mounted")
    return REFERENCE_DIR


def tiny_overrides(**over):
    base = {
        "vicreg": "fast",
        "dim": 32,
        "embeddim": 64,
        "vicreg.mlp": "'64-%d'",
        "vicreg.batch_size": 8,
        "image.height": 64,
        "image.width": 64,
        "torchsynth.buffer_size_seconds": 3 * 64 * 64 / 44100,
        "precision": "f32",
    }
    base.update(over)
    return [f"{k}={v}" for k, v in base.items()]


@pytest.fixture(scope="session")
def tiny_task():
    """One shared tiny VicregPretrainTask on the 8-device CPU mesh — compiling it
    (init + train/val steps) costs ~40 s, so test modules share a session instance."""
    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
    from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask
    from inverse_audio_synthesis_tpu.utils.config import load_config

    cfg = load_config(overrides=tiny_overrides())
    return VicregPretrainTask(cfg, create_mesh(data=8, model=1))

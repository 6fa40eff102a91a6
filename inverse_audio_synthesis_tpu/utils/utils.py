"""Misc utilities (reference: utils.py:1-13)."""

import datetime
import os
import subprocess


def enable_compile_cache(path: str = "~/.cache/ias_tpu_jax_cache") -> None:
    """Enable JAX's persistent compilation cache for this process.

    Through the tunneled TPU the per-program compile round trip dominates CLI and
    bench startup (tens of seconds per jitted program at full config); the cache
    keys on the HLO hash so code changes invalidate naturally. Called by every CLI
    entry point and bench.py; opt out with IAS_NO_COMPILE_CACHE=1 (e.g. when
    measuring cold-compile time itself). Safe to call before or after backend
    init — only jitted computations dispatched afterwards are affected."""
    if os.environ.get("IAS_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # an old jaxlib without the flags: cache is an optimization
        pass


def utcstr() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d-%H-%M-%S")


def _git_sha() -> str:
    """SHA of the working repo, '' if unavailable (reference: utils.py:12-13)."""
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
                check=True,
            ).stdout.strip()
        )
    except Exception:
        return ""


git_sha = _git_sha()

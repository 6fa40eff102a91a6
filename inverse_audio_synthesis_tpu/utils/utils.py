"""Misc utilities (reference: utils.py:1-13)."""

import datetime
import subprocess


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

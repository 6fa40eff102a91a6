#!/usr/bin/env python3
"""Garbage-collect run artifacts (the local equivalent of the reference's
wandb-cleanup.py:9-33, which deleted un-aliased model artifact versions).

Deletes checkpoint step directories that are neither the "last" alias nor among the
newest ``--keep`` per checkpoint family; optionally prunes old run dirs.

    python tools/cleanup_runs.py runs/ [--keep 2] [--dry-run]
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path


def cleanup(run_dir: Path, keep: int, dry_run: bool) -> int:
    freed = 0
    for family in (run_dir / "checkpoints").glob("*") if (run_dir / "checkpoints").exists() else []:
        steps = sorted(d for d in family.glob("step_*") if d.is_dir())
        last_name = None
        last_file = family / "last"
        if last_file.exists():
            last_name = last_file.read_text().strip()
        protected = {s.name for s in steps[-keep:]} | ({last_name} if last_name else set())
        for step_dir in steps:
            if step_dir.name in protected:
                continue
            size = sum(f.stat().st_size for f in step_dir.rglob("*") if f.is_file())
            freed += size
            print(f"{'DRY-RUN ' if dry_run else ''}delete {step_dir} ({size/1e6:.1f} MB)")
            if not dry_run:
                shutil.rmtree(step_dir, ignore_errors=True)
                meta = family / f"{step_dir.name}.metrics.json"
                if meta.exists():
                    meta.unlink()
    return freed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("--keep", type=int, default=2)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    freed = cleanup(args.run_dir, args.keep, args.dry_run)
    print(f"{'would free' if args.dry_run else 'freed'} {freed/1e6:.1f} MB")


if __name__ == "__main__":
    main()

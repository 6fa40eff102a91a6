#!/usr/bin/env python3
"""Summarize campaign run dirs for BASELINE.md reporting.

Reads each run dir's metrics.jsonl and prints, per run:
- the loss curve sampled at checkpoints of interest (first, 100, 500, 1k, 2k, ..., last)
- the final test metrics with their trivial-baseline floors side by side and a
  beats-floor verdict per metric.

Usage:
  python tools/summarize_runs.py runs/campaign_r4/init_fixture runs/campaign_r4/init_random
  python tools/summarize_runs.py --metric vicreg/train/loss runs/campaign_r4/*
No JAX import — safe to run while the chip is busy.
"""
import argparse
import json
import sys
from pathlib import Path

SAMPLE_STEPS = (0, 50, 100, 200, 500, 1000, 2000, 5000, 10000, 20000, 22500)

# (metric, floor, lower_is_better) triples known to this framework
FLOOR_PAIRS = [
    ("audio_to_params/test/param_mae", "audio_to_params/baseline/param_mae_const05", True),
    ("audio_to_params/test/mel_l1", "audio_to_params/baseline/mel_l1_silence", True),
    ("audio_to_params/test/mrstft", "audio_to_params/baseline/mrstft_silence", True),
]


def load_metrics(run_dir: Path):
    """All JSONL rows across this run dir (pretrain-*/ or flat), step-ordered."""
    files = sorted(run_dir.glob("**/metrics.jsonl"))
    rows = []
    for f in files:
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    rows.sort(key=lambda r: r.get("step", 0))
    return rows


def curve(rows, metric):
    pts = [(r["step"], r[metric]) for r in rows if metric in r]
    if not pts:
        return []
    want = set(SAMPLE_STEPS) | {pts[-1][0]}
    out, seen = [], set()
    for s, v in pts:
        # nearest sampled step at-or-after each anchor
        for anchor in sorted(want):
            if s >= anchor and anchor not in seen:
                seen.add(anchor)
                out.append((s, v))
                break
    if pts[-1] not in out:
        out.append(pts[-1])
    return out


def last_value(rows, metric):
    for r in reversed(rows):
        if metric in r:
            return r[metric], r.get("step")
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--metric", default=None,
                    help="curve metric (default: auto per run type)")
    args = ap.parse_args()

    for run in args.runs:
        run_dir = Path(run)
        rows = load_metrics(run_dir)
        if not rows:
            print(f"== {run}: no metrics found")
            continue
        print(f"== {run} ({len(rows)} rows, last step {rows[-1].get('step')})")
        metric = args.metric
        if metric is None:
            metric = ("vicreg/train/loss"
                      if any("vicreg/train/loss" in r for r in rows[:200])
                      else "audio_to_params/train/loss")
        pts = curve(rows, metric)
        if pts:
            print(f"  {metric}:")
            print("    " + "  ".join(f"{s}:{v:.4g}" for s, v in pts))
        for m, floor_m, lower in FLOOR_PAIRS:
            v, step = last_value(rows, m)
            fv, _ = last_value(rows, floor_m)
            if v is None:
                continue
            verdict = ""
            if fv is not None:
                beats = v < fv if lower else v > fv
                margin = (fv - v) / fv * 100 if lower else (v - fv) / fv * 100
                verdict = f" floor {fv:.4g} -> {'BEATS' if beats else 'LOSES'} ({margin:+.1f}%)"
            print(f"  {m} @ step {step}: {v:.4g}{verdict}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Capture a jax.profiler trace of the full VICReg train step and print the top
device ops by total duration — parsed straight from the chrome trace JSON, no
tensorboard/xprof plugin needed (this image has none).

Usage: python tools/trace_train_step.py [batch_size] [outdir]
"""
import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask
from inverse_audio_synthesis_tpu.utils.config import load_config


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_step"
    n_steps = 5

    print("backend:", jax.default_backend(), file=sys.stderr)
    mesh = create_mesh(devices=jax.devices()[:1])
    cfg = load_config(overrides=[f"vicreg.batch_size={batch}"])
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    state, m = task.train_step(state, 0)  # compile
    float(m["vicreg/train/loss"])  # hard sync (tunneled chip)

    t0 = time.time()
    with jax.profiler.trace(outdir):
        for i in range(1, n_steps + 1):
            state, m = task.train_step(state, i)
        float(m["vicreg/train/loss"])
    print(f"traced {n_steps} steps in {(time.time() - t0) * 1e3:.1f} ms", file=sys.stderr)

    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, file=sys.stderr)
    agg = collections.Counter()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "TPU" in pid_names.get(ev.get("pid"), ""):
                agg[ev.get("name", "?")[:80]] += ev.get("dur", 0)
    total = sum(agg.values())
    print(f"total device-event time: {total / 1e3:.2f} ms over {n_steps} steps")
    for name, dur in agg.most_common(30):
        print(f"{dur / 1e3 / n_steps:8.3f} ms/step  {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()

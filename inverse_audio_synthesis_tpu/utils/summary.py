"""Model summaries (the reference prints torchinfo summaries at startup,
pretrain.py:63-78) and the PQMF filter-range diagnostic (a working version of the
reference's dead plot_filter_range, pretrain.py:29-48, which referenced a nonexistent
attribute)."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def param_count(tree: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def summarize_params(params: Any, max_depth: int = 2) -> str:
    """Per-module parameter counts up to max_depth (ModelSummary(max_depth=2)
    equivalent, reference: pretrain.py:112-114)."""
    rows: List[Tuple[str, int]] = []

    def walk(node, path, depth):
        if depth >= max_depth or not isinstance(node, dict):
            rows.append(("/".join(path) or "<root>", param_count(node)))
            return
        for k in sorted(node):
            walk(node[k], path + [k], depth + 1)

    walk(params, [], 0)
    total = param_count(params)
    width = max((len(r[0]) for r in rows), default=10) + 2
    lines = [f"{'module':<{width}}params"]
    lines += [f"{name:<{width}}{n:,}" for name, n in rows]
    lines.append(f"{'TOTAL':<{width}}{total:,}")
    return "\n".join(lines)


def filter_range_stats(
    audio: np.ndarray, n_bands: int = 3, sample_rate: int = 44100
) -> Dict[str, float]:
    """Per-band PQMF output ranges for a clip — the diagnostic the reference meant to
    log as wandb line plots (pretrain.py:29-48). Returns {band_i_min/max/rms}."""
    import jax.numpy as jnp

    from inverse_audio_synthesis_tpu.ops.pqmf import PQMF

    x = np.asarray(audio, dtype=np.float32).reshape(1, 1, -1)
    bands = np.asarray(PQMF(n_bands=n_bands).analysis(jnp.asarray(x)))[0]
    stats: Dict[str, float] = {}
    for i, band in enumerate(bands):
        stats[f"pqmf/band{i}/min"] = float(band.min())
        stats[f"pqmf/band{i}/max"] = float(band.max())
        stats[f"pqmf/band{i}/rms"] = float(np.sqrt(np.mean(band**2)))
    return stats

"""HEAR-benchmark-style embedding API.

The reference names its smoke script after the HEAR benchmark but only prints an
output shape (reference: heareval.py:10-19). This module provides the actual HEAR API
surface (load_model / get_scene_embeddings / get_timestamp_embeddings) over the
pretrained audio tower, so the representations can be evaluated on HEAR-style tasks.

Scene embeddings tile/crop audio into the tower's native window (the synth buffer)
and average window embeddings; timestamp embeddings run the tower over windows
centered at a configurable hop (default 50 ms, HEAR's event-detection granularity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass
class HearModel:
    task: "VicregPretrainTask"  # noqa: F821
    state: object
    sample_rate: int
    scene_embedding_size: int
    timestamp_embedding_size: int

    @property
    def window_samples(self) -> int:
        return self.task.synth.buffer_size


def load_model(cfg, checkpoint_dir: Optional[str] = None, mesh=None) -> HearModel:
    from inverse_audio_synthesis_tpu.parallel.mesh import create_mesh
    from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
    from inverse_audio_synthesis_tpu.train.pretrain import VicregPretrainTask

    mesh = mesh or create_mesh(cfg.mesh.data, cfg.mesh.model)
    task = VicregPretrainTask(cfg, mesh)
    state = task.init_state()
    if checkpoint_dir:
        ckpt = CheckpointManager(checkpoint_dir)
        if ckpt.latest_step() is not None:
            state = ckpt.restore(state)
    return HearModel(
        task=task,
        state=state,
        sample_rate=cfg.torchsynth.rate,
        scene_embedding_size=cfg.dim,
        timestamp_embedding_size=cfg.dim,
    )


def _window(audio: jax.Array, window: int) -> jax.Array:
    """[B, T] → [B, n_win, window] by zero-padded tiling."""
    b, t = audio.shape
    n_win = max(1, -(-t // window))
    padded = jnp.pad(audio, ((0, 0), (0, n_win * window - t)))
    return padded.reshape(b, n_win, window)


def get_scene_embeddings(audio: jax.Array, model: HearModel) -> jax.Array:
    """[B, T] float audio in [-1, 1] → [B, dim] scene embeddings (mean over windows)."""
    wins = _window(audio, model.window_samples)
    b, n_win, w = wins.shape
    emb = model.task.embed_audio(model.state, wins.reshape(b * n_win, 1, w))
    return jnp.mean(emb.reshape(b, n_win, -1), axis=1)


def get_timestamp_embeddings(
    audio: jax.Array, model: HearModel, hop_ms: float = 50.0, chunk: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """[B, T] → ([B, n_ts, dim] embeddings, [B, n_ts] center timestamps in ms).

    HEAR-style timestamp embeddings at ``hop_ms`` granularity (default 50 ms, the
    benchmark's event-detection hop) rather than one per native window: each
    timestamp's embedding is the audio tower applied to the model's native window
    CENTERED on that timestamp, zero-padded at the clip edges. Windows are
    gathered and embedded in chunks of ``chunk`` timestamps so the [n_ts, window]
    expansion never materializes at once (a 4-s clip at 50 ms hop is 80 windows
    × 176,400 samples)."""
    b, t = audio.shape
    w = model.window_samples
    hop = max(1, int(round(model.sample_rate * hop_ms / 1000.0)))
    n_ts = max(1, -(-t // hop))
    centers = (jnp.arange(n_ts, dtype=jnp.int32) * hop + hop // 2).astype(jnp.int32)
    # window k covers [center_k - w/2, center_k + w/2) in clip coordinates; after
    # a w/2 left pad its start index is exactly center_k, and a w + hop//2 right
    # pad keeps every window in bounds even when hop > w (max center is
    # < t + hop//2, so max start + w <= t + hop//2 + w ≤ padded length) — JAX's
    # clamped gather would otherwise silently return repeated-tail windows
    padded = jnp.pad(audio, ((0, 0), (w // 2, w + hop // 2)))
    offsets = jnp.arange(w, dtype=jnp.int32)
    # pad the timestamp axis to a chunk multiple: every embed call compiles once
    n_pad = -(-n_ts // chunk) * chunk
    starts = jnp.pad(centers, (0, n_pad - n_ts))
    embs = []
    for i in range(0, n_pad, chunk):
        idx = starts[i : i + chunk, None] + offsets[None, :]  # [chunk, w]
        wins = padded[:, idx]  # [B, chunk, w]
        emb = model.task.embed_audio(
            model.state, wins.reshape(b * chunk, 1, w)
        )
        embs.append(emb.reshape(b, chunk, -1))
    emb = jnp.concatenate(embs, axis=1)[:, :n_ts]
    ts = centers.astype(jnp.float32) * 1000.0 / model.sample_rate
    return emb, jnp.broadcast_to(ts[None, :], (b, n_ts))

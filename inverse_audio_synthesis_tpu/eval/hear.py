"""HEAR-benchmark-style embedding API.

The reference names its smoke script after the HEAR benchmark but only prints an
output shape (reference: heareval.py:10-19). This module provides the actual HEAR API
surface (load_model / get_scene_embeddings / get_timestamp_embeddings) over the
pretrained audio tower, so the representations can be evaluated on HEAR-style tasks.

Audio of arbitrary length is handled by tiling/cropping into the tower's native
window (the synth buffer) and averaging window embeddings.
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
    audio: jax.Array, model: HearModel
) -> Tuple[jax.Array, jax.Array]:
    """[B, T] → ([B, n_win, dim] embeddings, [B, n_win] center timestamps in ms)."""
    wins = _window(audio, model.window_samples)
    b, n_win, w = wins.shape
    emb = model.task.embed_audio(model.state, wins.reshape(b * n_win, 1, w))
    emb = emb.reshape(b, n_win, -1)
    centers = (jnp.arange(n_win) + 0.5) * (w / model.sample_rate) * 1000.0
    return emb, jnp.broadcast_to(centers[None, :], (b, n_win))

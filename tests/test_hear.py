"""HEAR embedding API over the pretrained audio tower."""

import numpy as np

import jax.numpy as jnp

from inverse_audio_synthesis_tpu.eval.hear import (
    get_scene_embeddings,
    get_timestamp_embeddings,
)



def test_hear_api(tiny_task):
    from inverse_audio_synthesis_tpu.eval.hear import HearModel

    cfg = tiny_task.cfg
    model = HearModel(
        task=tiny_task,
        state=tiny_task.init_state(),
        sample_rate=cfg.torchsynth.rate,
        scene_embedding_size=cfg.dim,
        timestamp_embedding_size=cfg.dim,
    )
    window = model.window_samples

    # 2.5 windows of audio → 3 windows after padding
    audio = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (2, int(2.5 * window))).astype(np.float32)
    )
    scene = get_scene_embeddings(audio, model)
    assert scene.shape == (2, cfg.dim)
    assert np.isfinite(np.asarray(scene)).all()

    # timestamp embeddings at a hop much finer than the native window (HEAR-style
    # ~50 ms granularity; here a hop of half a window keeps the tiny test cheap)
    hop_ms = window / 2 / cfg.torchsynth.rate * 1000.0
    emb, ts = get_timestamp_embeddings(audio, model, hop_ms=hop_ms, chunk=4)
    n_ts = emb.shape[1]
    assert n_ts == 5  # ceil(2.5 windows / half-window hop)
    assert emb.shape == (2, n_ts, cfg.dim)
    assert ts.shape == (2, n_ts)
    assert np.isfinite(np.asarray(emb)).all()
    # timestamps are evenly spaced by the hop and centered in it
    spacing = np.diff(np.asarray(ts[0]))
    np.testing.assert_allclose(spacing, hop_ms, rtol=1e-3)
    np.testing.assert_allclose(float(ts[0, 0]), hop_ms / 2, rtol=1e-2)
    # an in-bounds window must equal the tower applied to the raw slice it covers:
    # window k spans [center_k - w/2, center_k + w/2) in clip coordinates
    hop = window // 2
    k = 2
    start = k * hop + hop // 2 - window // 2
    assert 0 <= start and start + window <= audio.shape[1]
    ref_emb = tiny_task.embed_audio(model.state, audio[:, None, start : start + window])
    np.testing.assert_allclose(
        np.asarray(emb[:, k]), np.asarray(ref_emb), rtol=2e-4, atol=2e-5
    )

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

    emb, ts = get_timestamp_embeddings(audio, model)
    assert emb.shape == (2, 3, cfg.dim)
    assert ts.shape == (2, 3)
    assert float(ts[0, 1]) > float(ts[0, 0])
    # scene embedding is the window mean
    np.testing.assert_allclose(
        np.asarray(scene), np.asarray(emb.mean(axis=1)), rtol=1e-5, atol=1e-5
    )

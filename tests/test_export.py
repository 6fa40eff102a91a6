"""Serving export: StableHLO artifact round-trips (serve/export.py).

The reference has no deployment surface (heareval.py is a shape-print stub);
these tests pin that every exported artifact — embedding tower, inverse head,
synthesizer — deserializes from bytes and reproduces the live function exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from inverse_audio_synthesis_tpu.serve import (
    export_embed_audio,
    export_predict_params,
    export_render,
    load_exported,
    save_exported,
)
from inverse_audio_synthesis_tpu.synth.config import SynthConfig
from inverse_audio_synthesis_tpu.synth.voice import render_voice, sample_voice_params


def test_export_embed_audio_roundtrip(tiny_task, tmp_path):
    state = tiny_task.init_state()
    batch = 4
    exp = export_embed_audio(tiny_task, state, batch)
    path = tmp_path / "embed_audio.stablehlo"
    save_exported(exp, path)
    assert path.stat().st_size > 0
    loaded = load_exported(path)

    audio = jax.random.uniform(
        jax.random.PRNGKey(0),
        (batch, 1, tiny_task.synth.buffer_size),
        minval=-1.0,
        maxval=1.0,
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    got = loaded.call(variables, audio)
    want = tiny_task.embed_audio(state, audio)
    assert got.shape == (batch, tiny_task.cfg.dim)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # the artifact's call is traceable: compose under jit on the serving side
    jitted = jax.jit(lambda v, a: loaded.call(v, a))(variables, audio)
    np.testing.assert_array_equal(np.asarray(jitted), np.asarray(want))


def test_export_render_roundtrip(tmp_path):
    cfg = SynthConfig(batch_size=4, buffer_size_seconds=0.05, sample_rate=44100)
    params01 = sample_voice_params(0, cfg)
    exp = export_render(cfg, 4)
    path = tmp_path / "render.stablehlo"
    save_exported(exp, path)
    loaded = load_exported(path)
    got = loaded.call(params01)
    want = render_voice(params01, cfg)
    assert got.shape == (4, cfg.buffer_size)
    # the deserialized module is re-lowered/re-fused from StableHLO, so the
    # transcendental-heavy oscillator chain may fold constants in a different
    # order than the live jit — measured max |Δ| ~6e-7 on ~1e-2 signals
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-6, rtol=0
    )


def test_export_predict_params_roundtrip(tiny_task, tmp_path):
    from inverse_audio_synthesis_tpu.train.downstream import AudioToParamsTask
    from inverse_audio_synthesis_tpu.utils.config import load_config

    from conftest import tiny_overrides

    cfg = load_config(overrides=tiny_overrides(**{"audio_to_params.batch_size": 8}))
    pre_state = tiny_task.init_state()
    task = AudioToParamsTask(cfg, tiny_task.mesh, tiny_task, pre_state)
    state = task.init_state()
    batch = 8
    exp = export_predict_params(task, state, batch)
    path = tmp_path / "predict_params.stablehlo"
    save_exported(exp, path)
    loaded = load_exported(path)

    audio = jax.random.uniform(
        jax.random.PRNGKey(1),
        (batch, 1, task.synth.buffer_size),
        minval=-1.0,
        maxval=1.0,
    )
    head_vars = {"params": state.params, "batch_stats": state.batch_stats}
    got = loaded.call(task.frozen, head_vars, audio)
    assert got.shape == (batch, cfg.nparams)
    # live reference: frozen audio repr -> head (inference)
    repr_ = task._audio_repr(task.frozen, audio)
    want = task.head.apply(head_vars, repr_.astype(jnp.float32), train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # predictions live in the normalized parameter space (sigmoid head)
    g = np.asarray(got)
    assert ((g >= 0.0) & (g <= 1.0)).all()


def test_export_rejects_wrong_shape(tiny_task):
    state = tiny_task.init_state()
    exp = export_embed_audio(tiny_task, state, batch=4)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    bad_audio = jnp.zeros((2, 1, tiny_task.synth.buffer_size), jnp.float32)
    with pytest.raises(ValueError):
        exp.call(variables, bad_audio)

"""Downstream inverse-synthesis task + retrieval eval on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverse_audio_synthesis_tpu.eval.retrieval import RetrievalEvaluator, cdist
from inverse_audio_synthesis_tpu.train.downstream import AudioToParamsTask
from inverse_audio_synthesis_tpu.train.pretrain import synth_config_from_cfg

from test_train import tiny_cfg


@pytest.fixture(scope="module")
def pretrain(tiny_task):
    cfg = tiny_cfg(**{"audio_to_params.batch_size": 8})
    state = tiny_task.init_state()
    return cfg, tiny_task.mesh, tiny_task, state


@pytest.mark.slow
def test_downstream_train_and_test(pretrain):
    cfg, mesh, pre_task, pre_state = pretrain
    task = AudioToParamsTask(cfg, mesh, pre_task, pre_state)
    state = task.init_state()

    first = None
    for i in range(6):
        state, metrics = task.train_step(state, 10 + i % 2)
        if first is None:
            first = float(metrics["audio_to_params/train/loss"])
        assert np.isfinite(float(metrics["audio_to_params/train/loss"]))
    # frozen vicreg loss is a constant diagnostic of the frozen towers
    assert np.isfinite(float(metrics["audio_to_params/train/frozen_vicreg_loss"]))

    metrics, true_audio, pred_audio = task.test_step(state, 99)
    assert true_audio.shape == pred_audio.shape
    for k in (
        "audio_to_params/test/loss",
        "audio_to_params/test/mel_l1",
        "audio_to_params/test/mrstft",
        "audio_to_params/test/param_mae",
    ):
        assert np.isfinite(float(metrics[k])), k
    # predicted params in (0, 1) ⇒ resynthesized audio is valid/finite
    assert np.isfinite(np.asarray(pred_audio)).all()


def test_downstream_combined_loss(pretrain):
    """'combined' objective: loss == Σ wᵢ·componentᵢ, components logged per step."""
    _, mesh, pre_task, pre_state = pretrain
    cfg = tiny_cfg(
        **{
            "audio_to_params.batch_size": 8,
            "audio_to_params.loss": "combined",
            "audio_to_params.loss_weights.param_mse": 1.0,
            "audio_to_params.loss_weights.mel_l1": 0.25,
            # also exercises the row-subset mel term (see small.yaml mel_rows)
            "audio_to_params.mel_rows": 4,
        }
    )
    task = AudioToParamsTask(cfg, mesh, pre_task, pre_state)
    state = task.init_state()
    state, metrics = task.train_step(state, 11)
    loss = float(metrics["audio_to_params/train/loss"])
    pm = float(metrics["audio_to_params/train/param_mse"])
    ml = float(metrics["audio_to_params/train/mel_l1"])
    assert np.isfinite(loss) and np.isfinite(pm) and np.isfinite(ml)
    np.testing.assert_allclose(loss, pm + 0.25 * ml, rtol=1e-5)
    # a second step still trains (state advances, loss stays finite)
    state, metrics2 = task.train_step(state, 12)
    assert np.isfinite(float(metrics2["audio_to_params/train/loss"]))


def test_downstream_triple_objective(pretrain):
    """Three-term combined loss (param_mse + embedding + mel_l1) composes.

    The stage-H campaign objective (tools/campaign_r4e.sh): param supervision
    anchors aggregate MAE, the embedding term shapes representation-space fit,
    the grad-through-synth mel term drives perceptual quality. No reference
    objective composes these (/root/reference/audio_to_params.py:229 is
    embedding-space MSE only; the grad-through-synth experiment is commented
    out at :56-174).
    """
    _, mesh, pre_task, pre_state = pretrain
    cfg = tiny_cfg(
        **{
            "audio_to_params.batch_size": 8,
            "audio_to_params.loss": "combined",
            "audio_to_params.loss_weights.param_mse": 1.0,
            "audio_to_params.loss_weights.embedding": 1.0,
            "audio_to_params.loss_weights.mel_l1": 0.1,
            "audio_to_params.mel_rows": 4,
        }
    )
    task = AudioToParamsTask(cfg, mesh, pre_task, pre_state)
    state = task.init_state()
    state, metrics = task.train_step(state, 11)
    loss = float(metrics["audio_to_params/train/loss"])
    pm = float(metrics["audio_to_params/train/param_mse"])
    emb = float(metrics["audio_to_params/train/embedding"])
    ml = float(metrics["audio_to_params/train/mel_l1"])
    assert np.isfinite(loss) and np.isfinite(pm) and np.isfinite(emb) and np.isfinite(ml)
    np.testing.assert_allclose(loss, pm + emb + 0.1 * ml, rtol=1e-5)


def test_frozen_towers_not_updated(pretrain):
    cfg, mesh, pre_task, pre_state = pretrain
    task = AudioToParamsTask(cfg, mesh, pre_task, pre_state)
    frozen_before = jax.tree_util.tree_map(np.asarray, task.frozen["params"])
    state = task.init_state()
    state, _ = task.train_step(state, 5)
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen_before),
        jax.tree_util.tree_leaves(task.frozen["params"]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_cdist_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    a = rng.randn(5, 7).astype(np.float32)
    b = rng.randn(9, 7).astype(np.float32)
    ours = np.asarray(cdist(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch.cdist(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_retrieval_monotone(pretrain):
    cfg, mesh, pre_task, pre_state = pretrain

    def embed(variables, audio):
        return pre_task.model.apply(
            variables, audio, train=False, method=pre_task.model.embed_audio
        )

    ev = RetrievalEvaluator(
        embed_fn=embed,
        variables={"params": pre_state.params, "batch_stats": pre_state.batch_stats},
        query_synth=synth_config_from_cfg(cfg, 4),
        candidate_synth=synth_config_from_cfg(cfg, 8),
    )
    assert np.isinf(np.asarray(ev.best_dist)).all()
    result = ev.run(n_batches=3)
    assert np.isfinite(result["best_dist"]).all()  # all queries matched something
    assert result["best_audio"].shape == (4, ev.candidate_synth.buffer_size)
    # the NN's params are tracked alongside its audio; MAE is bounded by the
    # normalized param space
    assert result["best_params"].shape == result["query_params"].shape
    assert (result["nn_param_mae"] >= 0).all() and (result["nn_param_mae"] <= 1).all()


@pytest.mark.slow
def test_retrieval_nn_param_mae_exact_match(pretrain):
    """With candidate_synth == query_synth, the candidate batch at the query's own
    batch number reproduces the queries exactly (params are batch-keyed and the
    candidate noise rows are position-keyed like the query's fixed buffer), so the
    stream must retrieve them at distance ~0 with an exact param copy —
    nn_param_mae == 0, the strongest check that best_params tracks best_audio."""
    cfg, mesh, pre_task, pre_state = pretrain

    def embed(variables, audio):
        return pre_task.model.apply(
            variables, audio, train=False, method=pre_task.model.embed_audio
        )

    ev = RetrievalEvaluator(
        embed_fn=embed,
        variables={"params": pre_state.params, "batch_stats": pre_state.batch_stats},
        query_synth=synth_config_from_cfg(cfg, 4),
        candidate_synth=synth_config_from_cfg(cfg, 4),
        query_batch_num=2,
    )
    result = ev.run(n_batches=3)  # streams candidate batches 1, 2, 3
    np.testing.assert_allclose(result["best_dist"], 0.0, atol=1e-3)
    np.testing.assert_array_equal(result["best_params"], result["query_params"])
    np.testing.assert_array_equal(result["nn_param_mae"], 0.0)


@pytest.mark.slow
def test_retrieval_inner_chunking_and_artifacts(pretrain, tmp_path):
    """The 1024-candidate reference config compiles via an inner lax.scan over
    sub-chunks; convergence artifacts (CSV + PNG) are written from the history."""
    cfg, mesh, pre_task, pre_state = pretrain

    def embed(variables, audio):
        return pre_task.model.apply(
            variables, audio, train=False, method=pre_task.model.embed_audio
        )

    ev = RetrievalEvaluator(
        embed_fn=embed,
        variables={"params": pre_state.params, "batch_stats": pre_state.batch_stats},
        query_synth=synth_config_from_cfg(cfg, 4),
        candidate_synth=synth_config_from_cfg(cfg, 8),
        inner_chunk=4,  # 8 candidates → scan of 2 sub-chunks
    )
    result = ev.run(n_batches=4, artifact_dir=str(tmp_path))
    assert np.isfinite(result["best_dist"]).all()
    # monotone history, final row == best
    hist = result["history"]
    assert hist.shape == (4, 4)
    assert (np.diff(hist, axis=0) <= 1e-6).all()
    np.testing.assert_allclose(hist[-1], result["best_dist"], rtol=1e-6)
    assert (tmp_path / "convergence.csv").exists()
    lines = (tmp_path / "convergence.csv").read_text().strip().splitlines()
    assert len(lines) == 5 and lines[0].startswith("batch,")
    assert (tmp_path / "convergence.png").exists()


@pytest.mark.slow
def test_retrieval_resume_bit_identical(pretrain, tmp_path):
    """A run interrupted after k batches and resumed from state.npz must produce the
    same best-distances and history as one uninterrupted run (the candidate stream
    is a pure function of the batch number)."""
    cfg, mesh, pre_task, pre_state = pretrain

    def embed(variables, audio):
        return pre_task.model.apply(
            variables, audio, train=False, method=pre_task.model.embed_audio
        )

    def make_ev():
        return RetrievalEvaluator(
            embed_fn=embed,
            variables={"params": pre_state.params, "batch_stats": pre_state.batch_stats},
            query_synth=synth_config_from_cfg(cfg, 4),
            candidate_synth=synth_config_from_cfg(cfg, 8),
        )

    full = make_ev().run(n_batches=5, artifact_dir=str(tmp_path / "full"))

    part_dir = str(tmp_path / "part")
    make_ev().run(n_batches=2, artifact_dir=part_dir, save_state_every=1)
    resumed = make_ev().run(n_batches=5, artifact_dir=part_dir, save_state_every=1)

    np.testing.assert_array_equal(full["best_dist"], resumed["best_dist"])
    np.testing.assert_array_equal(full["history"], resumed["history"])
    np.testing.assert_array_equal(full["best_audio"], resumed["best_audio"])
    assert resumed["completed"] and resumed["batches_done"] == 5

    # a different chunking (different candidate noise stream) must NOT resume from
    # the saved state — shapes match but the fingerprint differs
    ev2 = RetrievalEvaluator(
        embed_fn=embed,
        variables={"params": pre_state.params, "batch_stats": pre_state.batch_stats},
        query_synth=synth_config_from_cfg(cfg, 4),
        candidate_synth=synth_config_from_cfg(cfg, 8),
        inner_chunk=4,
    )
    fresh = ev2.run(n_batches=5, artifact_dir=part_dir)
    assert fresh["history"].shape[0] == 5  # from scratch, not 2 resumed + 3


@pytest.mark.slow
def test_mel_l1_backprop_through_synth(pretrain):
    """The working version of the reference's commented-out 'backprop through the
    synth' experiment (audio_to_params.py:56-174)."""
    cfg, mesh, pre_task, pre_state = pretrain
    cfg = type(cfg)(cfg.to_dict())  # copy
    cfg.audio_to_params["loss"] = "mel_l1"
    task = AudioToParamsTask(cfg, mesh, pre_task, pre_state)
    state = task.init_state()
    losses = []
    for i in range(4):
        state, m = task.train_step(state, 7)  # same batch repeatedly
        losses.append(float(m["audio_to_params/train/loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses  # gradients through the synth reduce mel L1


def test_mel_chunk_matches_unchunked(pretrain):
    """audio_to_params.mel_chunk evaluates the grad-through-synth mel term in
    row chunks under jax.checkpoint (bounding residual memory at the reference's
    batch 1024). Chunks are equal-sized and carry their own position-keyed noise
    rows, so loss AND gradients must match the unchunked term up to reduction
    association — the knob is exact, unlike the mel_rows subsample."""
    _, mesh, pre_task, pre_state = pretrain

    def make(overrides):
        cfg = tiny_cfg(
            **{
                "audio_to_params.batch_size": 8,
                "audio_to_params.loss": "mel_l1",
                **overrides,
            }
        )
        return AudioToParamsTask(cfg, mesh, pre_task, pre_state)

    task_full = make({})
    task_chunk = make({"audio_to_params.mel_chunk": 4})
    state_f = task_full.init_state()
    state_c = task_chunk.init_state()
    for a, b in zip(
        jax.tree_util.tree_leaves(state_f.params),
        jax.tree_util.tree_leaves(state_c.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state_f, mf = task_full.train_step(state_f, 17)
    state_c, mc = task_chunk.train_step(state_c, 17)
    np.testing.assert_allclose(
        float(mf["audio_to_params/train/loss"]),
        float(mc["audio_to_params/train/loss"]),
        rtol=1e-5,
    )
    # the post-update params agree ⇒ the gradients agreed
    for a, b in zip(
        jax.tree_util.tree_leaves(state_f.params),
        jax.tree_util.tree_leaves(state_c.params),
    ):
        # association-only deltas (mean-of-chunk-means vs global mean) pass
        # through the LARS trust ratio; bound absolute drift after one update
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-4, atol=5e-6
        )

    # a chunk size that does not divide the batch is rejected at trace time
    task_bad = make({"audio_to_params.mel_chunk": 3})
    with pytest.raises(ValueError, match="mel_chunk"):
        task_bad.train_step(task_bad.init_state(), 17)


def test_param_mse_objective_and_baseline_floors(pretrain):
    """The direct-supervision objective trains (loss finite and decreasing over a
    repeated batch), and the test metrics carry the trivial-baseline floors: the
    constant-0.5 predictor's param-MAE ≈ 0.25 on uniform params and the silence
    predictor's spectral distances (every headline metric needs a floor to beat)."""
    cfg, mesh, pre_task, pre_state = pretrain
    cfg2 = tiny_cfg(
        **{"audio_to_params.batch_size": 8, "audio_to_params.loss": "param_mse"}
    )
    task = AudioToParamsTask(cfg2, mesh, pre_task, pre_state)
    state = task.init_state()
    losses = []
    for _ in range(8):
        state, metrics = task.train_step(state, 21)  # same batch: must overfit
        losses.append(float(metrics["audio_to_params/train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    metrics, _, _ = task.test_step(state, 99)
    const05 = float(metrics["audio_to_params/baseline/param_mae_const05"])
    assert 0.15 < const05 < 0.35  # ≈0.25 for uniform [0,1] params
    assert float(metrics["audio_to_params/baseline/mel_l1_silence"]) > 0
    assert float(metrics["audio_to_params/baseline/mrstft_silence"]) > 0


def test_frozen_bn_batch_mode(pretrain):
    """frozen_bn: "batch" — frozen towers normalize on the current batch's
    statistics instead of eval-mode running averages (which collapse with
    pretrain batch size: tools/probe_frozen_bn.py). Pins: (a) the mode is
    deterministic (no dropout noise despite train=True), (b) the projected
    param embedding is MORE discriminative across inputs than the running-stats
    mode on a random-init model, (c) train/test steps run and stay finite,
    (d) the frozen variables are untouched."""
    cfg, mesh, pre_task, pre_state = pretrain
    cfg_b = tiny_cfg(
        **{"audio_to_params.batch_size": 8, "audio_to_params.frozen_bn": "batch"}
    )
    task_b = AudioToParamsTask(cfg_b, mesh, pre_task, pre_state)
    task_r = AudioToParamsTask(cfg, mesh, pre_task, pre_state)

    import jax

    p = jax.random.uniform(jax.random.PRNGKey(0), (8, cfg.nparams))
    e1 = np.asarray(task_b._embed_params(task_b.frozen, p), np.float32)
    e2 = np.asarray(task_b._embed_params(task_b.frozen, p), np.float32)
    np.testing.assert_array_equal(e1, e2)  # deterministic: dropout really is off

    er = np.asarray(task_r._embed_params(task_r.frozen, p), np.float32)
    row_mse_batch = float(((e1[0] - e1[1]) ** 2).mean())
    row_mse_running = float(((er[0] - er[1]) ** 2).mean())
    assert row_mse_batch > 0.0
    # batch-stats BN recenters/rescales per batch — on these towers the
    # cross-input separation should not be WORSE than running-stats mode
    assert row_mse_batch >= 0.1 * row_mse_running

    state = task_b.init_state()
    stats_before = jax.tree.map(lambda x: np.asarray(x).copy(), task_b.frozen)
    losses = []
    for i in range(3):
        state, metrics = task_b.train_step(state, 30 + i)
        losses.append(float(metrics["audio_to_params/train/loss"]))
    assert np.isfinite(losses).all()
    metrics, _, pred_audio = task_b.test_step(state, 99)
    assert np.isfinite(float(metrics["audio_to_params/test/param_mae"]))
    assert np.isfinite(np.asarray(pred_audio)).all()
    # frozen means frozen: neither params nor batch_stats moved
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        task_b.frozen,
        stats_before,
    )


def test_frozen_embedding_collapse_warning(pretrain, caplog):
    """The init-time collapse probe: a frozen state whose param tower maps every
    input to the same embedding (all-zero weights) must trigger the loud
    frozen-embedding-collapse warning under the embedding objective; a healthy
    random-init state must not; objectives without an embedding term skip the
    probe entirely."""
    import logging

    cfg, mesh, pre_task, pre_state = pretrain
    collapsed = pre_state.replace(
        params=jax.tree.map(jnp.zeros_like, pre_state.params)
    )

    with caplog.at_level(logging.WARNING):
        caplog.clear()
        AudioToParamsTask(cfg, mesh, pre_task, collapsed)
        assert any("frozen projected-param-embedding" in r.message for r in caplog.records)

        caplog.clear()
        AudioToParamsTask(cfg, mesh, pre_task, pre_state)
        assert not any(
            "frozen projected-param-embedding" in r.message for r in caplog.records
        )

        # param_mse-only objective: no embedding term, no probe, even collapsed
        caplog.clear()
        cfg_p = tiny_cfg(
            **{"audio_to_params.batch_size": 8, "audio_to_params.loss": "param_mse"}
        )
        AudioToParamsTask(cfg_p, mesh, pre_task, collapsed)
        assert not any(
            "frozen projected-param-embedding" in r.message for r in caplog.records
        )


def test_retrieval_planted_query_check(pretrain):
    """Planted-query sanity: the query params pushed through the CANDIDATE
    pipeline must land at distance ≈0 from the stored query embeddings; a
    perturbed noise keying (wrong row_offset) must be caught."""
    from inverse_audio_synthesis_tpu.eval.retrieval import RetrievalEvaluator

    cfg, mesh, pre_task, pre_state = pretrain
    variables = {"params": pre_state.params, "batch_stats": pre_state.batch_stats}

    def embed(variables, audio):
        return pre_task.model.apply(
            variables, audio, train=False, method=pre_task.model.embed_audio
        )

    ev = RetrievalEvaluator(
        embed_fn=embed,
        variables=variables,
        query_synth=synth_config_from_cfg(cfg, 4),
        candidate_synth=synth_config_from_cfg(cfg, 8),
        inner_chunk=4,
    )
    diag, d = ev.planted_query_distance()
    assert (diag < 1e-4).all(), diag  # CPU fp32: the two programs agree tightly
    ev.assert_planted_queries_found()

    # negative control: corrupt the stored query embedding -> check must fail
    ev.query_emb = ev.query_emb + 1.0
    with pytest.raises(AssertionError):
        ev.assert_planted_queries_found()

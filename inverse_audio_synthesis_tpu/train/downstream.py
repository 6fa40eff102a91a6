"""Downstream inverse-synthesis task: frozen VICReg towers → parameter prediction.

TPU-native counterpart of the reference's ``AudioToParams`` LightningModule
(reference: audio_to_params.py:177-312): a trainable head maps frozen audio
representations to the 78 normalized synth params; the loss is embedding-space MSE
between the true-parameter embedding and the predicted-parameter embedding (both
through the frozen param tower + projector, audio_to_params.py:218-229), with the
frozen vicreg loss logged as a diagnostic (audio_to_params.py:230-231).

Test-time resynthesis: the reference mutates its Voice via 78 host-side
``set_parameter_0to1`` calls then synthesizes (audio_to_params.py:240-257 — flagged in
SURVEY.md as a hot-loop killer). Here predicted params feed straight back into the pure
``render_voice`` inside the same jitted program, and the resynthesized audio is scored
with mel-L1 and multi-resolution STFT losses (the reference only sketched this —
audio_to_params.py:150-153,233).

Deviation (documented): the reference generates *training* batches from the pretrain
module's Voice — i.e. at the pretrain batch size — while its own downstream-batch-size
Voice is used only at test time, which crashes if the sizes differ
(audio_to_params.py:215 vs :240-246). Here both use ``cfg.audio_to_params.batch_size``.

Training losses (``cfg.audio_to_params.loss``):
- ``"embedding"`` (default): embedding-space MSE, the reference's working objective.
- ``"param_mse"``: direct MSE against the true normalized parameters — the obvious
  supervised probe of the frozen representation (the quantity the reference's test
  path inspects via resynthesis, audio_to_params.py:240-257, trained directly).
- ``"mel_l1"``: mel-L1 between the true audio and audio resynthesized from the
  predicted parameters, backpropagated THROUGH the synthesizer — the experiment the
  reference left commented out because torchsynth isn't differentiable end-to-end
  ("TBH this probably won't work...", audio_to_params.py:71-73). The functional synth
  here is differentiable (tested), so this objective just works.
- ``"combined"``: a weighted sum of the above, weights from
  ``cfg.audio_to_params.loss_weights`` (default ``{param_mse: 1.0, mel_l1: 0.1}``).
  Direct parameter supervision anchors the head while the grad-through-synth
  spectral term pulls the *perceptual* metric (mel-L1) below its silence floor —
  the operating point where param-MSE alone leaves mel-L1 near the floor.

Test metrics carry TRIVIAL-BASELINE floors alongside every number: the constant-0.5
predictor's param-MAE (expected 0.25 against uniform [0,1] params) and the silence
predictor's mel-L1 / MR-STFT — a metric only means something when it beats these.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax.training import train_state

from inverse_audio_synthesis_tpu.models import AudioRepresentationToParams
from inverse_audio_synthesis_tpu.ops.stft import MelSpectrogram, multi_resolution_stft_loss
from inverse_audio_synthesis_tpu.parallel.mesh import param_shardings, shard_batch
from inverse_audio_synthesis_tpu.synth.voice import sample_voice_params
from inverse_audio_synthesis_tpu.train.optim import make_optimizer
from inverse_audio_synthesis_tpu.train.pretrain import (
    TrainState,
    VicregPretrainTask,
    make_render_fn,
    maybe_bf16_grads,
    synth_config_from_cfg,
)


class AudioToParamsTask:
    def __init__(self, cfg, mesh, pretrain_task: VicregPretrainTask, pretrain_state):
        self.cfg = cfg
        self.mesh = mesh
        # frozen-tower BatchNorm mode. "running" (default) = eval-mode running
        # averages, matching the reference's `self.vicreg.eval()` every step
        # (reference: audio_to_params.py:185,212-213). "batch" = normalize on the
        # CURRENT batch's statistics (running stats untouched): the embedding
        # geometry VICReg actually optimized lives in train-mode BN — measured
        # eval-mode discriminability of the projected param embedding COLLAPSES
        # with pretrain batch size (row-MSE between different params: 6.7e-4 at
        # b128 → 1.3e-7 at b512 → 4.3e-8 at b1024 pretrains, while train-mode
        # stays 0.2–0.6; tools/probe_frozen_bn.py), which starves the
        # embedding-space objective of signal. "batch" makes embeddings
        # batch-dependent — a documented deviation, off by default.
        frozen_bn = cfg.audio_to_params.get("frozen_bn", "running")
        assert frozen_bn in ("running", "batch"), frozen_bn
        self._frozen_train = frozen_bn == "batch"
        if self._frozen_train:
            # rebuild the frozen model with the param tower's dropout disabled so
            # train=True toggles ONLY batch-stats BN (flax keys both off `train`);
            # the variables are module-hyperparam-independent, so the pretrained
            # weights apply unchanged
            import copy as _copy

            from inverse_audio_synthesis_tpu.train.pretrain import build_vicreg_model

            cfg_nodrop = _copy.deepcopy(cfg)
            cfg_nodrop.param_embed.dropout = 0.0
            self.vicreg_model = build_vicreg_model(cfg_nodrop)
        else:
            self.vicreg_model = pretrain_task.model
        # frozen pretrained variables (reference: audio_to_params.py:183-185,212-213)
        self.frozen = {
            "params": pretrain_state.params,
            "batch_stats": pretrain_state.batch_stats,
        }
        self.synth = synth_config_from_cfg(cfg, cfg.audio_to_params.batch_size)
        self.head = AudioRepresentationToParams(
            nparams=cfg.nparams,
            dim=cfg.dim,
            hidden_norm=cfg.audio_to_params.hidden_norm,
            dropout=cfg.audio_to_params.dropout,
            dtype=jnp.bfloat16 if cfg.get("precision") == "bf16" else jnp.float32,
        )
        self.tx, self.schedule = make_optimizer(
            cfg.audio_to_params.optim,
            cfg.audio_to_params.batch_size,
            cfg.audio_to_params.get("scheduler"),
        )
        self._spectral_method = cfg.mel.get("method", "fft")
        # reported test metrics default to the fp32-honest path (~1e-6 vs ~2e-3 for
        # matmul_bf16) so they are comparable with the reference's fp32
        # torchaudio/auraloss numbers; the TRAINING mel_l1 loss keeps the fast path
        self._test_spectral_method = cfg.mel.get("test_method", self._spectral_method)

        def _make_mel(method):
            return MelSpectrogram(
                sample_rate=cfg.torchsynth.rate,
                n_fft=cfg.mel.n_fft,
                hop_length=cfg.mel.hop_length,
                n_mels=cfg.mel.n_mels,
                norm=cfg.mel.norm,
                mel_scale=cfg.mel.mel_scale,
                power=cfg.mel.power,
                method=method,
            )

        self.mel = _make_mel(self._spectral_method)
        self.mel_test = (
            self.mel
            if self._test_spectral_method == self._spectral_method
            else _make_mel(self._test_spectral_method)
        )
        self._render, self._noise = make_render_fn(
            self.synth, mesh, bwd=cfg.torchsynth.get("render_bwd", "pallas")
        )
        self._dropout_base = jax.random.PRNGKey(cfg.seed + 2)
        # NB: the frozen tower variables AND the noise buffer are passed as
        # ARGUMENTS to the jitted steps — closing over them bakes them into the
        # HLO as literal constants (692 MB of towers / 722 MB of noise at b1024,
        # breaking the remote-compile request limit)
        self._train_step_jit = jax.jit(self._train_step, donate_argnums=0)
        # test pass: ONE fused program when the serialized HLO fits the
        # remote-compile request limit (saves a dispatch round-trip through the
        # tunnel), else two programs (prediction / resynthesis+spectral metrics).
        # The fused attempt is made lazily on the first test_step; a compile
        # failure falls back to the split permanently for this task.
        self._test_predict = jax.jit(self._test_predict_impl)
        self._test_metrics = jax.jit(self._test_metrics_impl)
        self._test_full = jax.jit(self._test_full_impl)
        self._test_fused_ok: Optional[bool] = None
        self._warn_if_frozen_embedding_collapsed(pretrain_task)

    def _warn_if_frozen_embedding_collapsed(self, pretrain_task) -> None:
        """Detect the eval-mode-BN embedding collapse at init, before training.

        The `embedding` objective is MSE in the frozen projected-param-embedding
        space; that space only carries signal if different parameter vectors map to
        different embeddings under the BN mode in use. Measured (tools/
        probe_frozen_bn.py): eval-mode row-MSE collapses with pretrain batch size
        (6.7e-4 at b128 → 4.3e-8 at b1024 — LARS LR scales with batch), leaving the
        head a degenerate ~1e-8 loss and every parameter at chance, SILENTLY. This
        probe embeds a few random param rows through the frozen tower in the
        configured BN mode and warns loudly when their pairwise MSE is below
        threshold, pointing at the `frozen_bn: batch` fix
        (conf/audio_to_params/small.yaml)."""
        loss_kind = self.cfg.audio_to_params.get("loss", "embedding")
        if loss_kind == "combined":
            weights = dict(
                self.cfg.audio_to_params.get("loss_weights")
                or {"param_mse": 1.0, "mel_l1": 0.1}
            )
            if not weights.get("embedding"):
                return
        elif loss_kind != "embedding":
            return
        probe = jax.random.uniform(
            jax.random.PRNGKey(0), (8, self.cfg.nparams), dtype=jnp.float32
        )
        emb = jnp.asarray(self._embed_params(self.frozen, probe), jnp.float32)
        row_mse = float(jnp.mean((emb[:4] - emb[4:]) ** 2))
        # collapsed checkpoints measure ≤1e-7; working ones ≥6.7e-4 (b128).
        if row_mse < 1e-5:
            import logging

            logging.getLogger(__name__).warning(
                "frozen projected-param-embedding row-MSE is %.3e (<1e-5): the "
                "embedding objective has (almost) no signal — different parameter "
                "vectors map to near-identical frozen embeddings under the current "
                "BatchNorm mode. This is the eval-mode BN collapse seen at large "
                "pretrain batches; set `audio_to_params.frozen_bn: batch` to use "
                "batch-statistics BN for the frozen towers (see "
                "tools/probe_frozen_bn.py and conf/audio_to_params/small.yaml).",
                row_mse,
            )

    def train_step(self, state: TrainState, batch_num):
        return self._train_step_jit(state, batch_num, self.frozen, self._noise)

    def _train_step_multi(self, state: TrainState, batch_nums, frozen, noise):
        """k steps per dispatch via lax.scan (see VicregPretrainTask; the frozen
        towers and noise buffer stay scan-invariant jit arguments)."""

        def body(s, bn):
            return self._train_step(s, bn, frozen, noise)

        return jax.lax.scan(body, state, batch_nums)

    def train_step_multi(self, state: TrainState, batch_nums):
        if not hasattr(self, "_train_multi_jit"):
            self._train_multi_jit = jax.jit(self._train_step_multi, donate_argnums=0)
        return self._train_multi_jit(
            state, jnp.asarray(batch_nums, jnp.int32), self.frozen, self._noise
        )

    def init_state(self, key: Optional[jax.Array] = None) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        repr_dim = jnp.zeros((2, self.cfg.dim), jnp.float32)
        variables = jax.jit(partial(self.head.init, train=False))(key, repr_dim)
        state = TrainState.create(
            apply_fn=self.head.apply,
            params=variables["params"],
            tx=self.tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        return jax.device_put(state, param_shardings(state, self.mesh))

    # -- frozen tower helpers ----------------------------------------------------
    def _frozen_apply(self, frozen, x, method):
        """Apply a frozen-tower method under the configured BatchNorm mode.

        frozen_bn="batch": train=True gives batch-statistics BN; the mutated
        batch_stats are DISCARDED (the towers stay frozen) and no dropout rng is
        needed (the frozen model was rebuilt with dropout 0, which flax
        short-circuits before drawing randomness)."""
        if self._frozen_train:
            out, _ = self.vicreg_model.apply(
                frozen, x, train=True, method=method, mutable=["batch_stats"]
            )
            return out
        return self.vicreg_model.apply(frozen, x, train=False, method=method)

    def _audio_repr(self, frozen, audio):
        return self._frozen_apply(frozen, audio, self.vicreg_model.audio_repr)

    def _embed_params(self, frozen, params01):
        return self._frozen_apply(frozen, params01, self.vicreg_model.embed_params)

    def _project_repr(self, frozen, repr_):
        return self._frozen_apply(
            frozen, repr_, lambda m, r, train: m.projector(r, train=train)
        )

    def _synthesize(self, batch_num, noise):
        params01 = shard_batch(sample_voice_params(batch_num, self.synth), self.mesh)
        audio = shard_batch(self._render(params01, noise), self.mesh)
        return audio[:, None, :], params01

    def _shared(self, frozen, head_variables, audio, params01, train, dropout_key=None):
        audio_repr = self._audio_repr(frozen, audio)
        true_emb = self._embed_params(frozen, params01)
        rngs = {"dropout": dropout_key} if train else None
        if train:
            pred_params, mutated = self.head.apply(
                head_variables, audio_repr.astype(jnp.float32), train=True,
                rngs=rngs, mutable=["batch_stats"],
            )
        else:
            pred_params = self.head.apply(
                head_variables, audio_repr.astype(jnp.float32), train=False
            )
            mutated = None
        pred_emb = self._embed_params(frozen, pred_params)
        repr_loss = jnp.mean(
            (true_emb.astype(jnp.float32) - pred_emb.astype(jnp.float32)) ** 2
        )
        frozen_loss = jnp.mean(
            (
                true_emb.astype(jnp.float32)
                - self._project_repr(frozen, audio_repr).astype(jnp.float32)
            )
            ** 2
        )
        return pred_params, repr_loss, frozen_loss, mutated

    # -- steps ---------------------------------------------------------------------
    def _train_step(self, state: TrainState, batch_num, frozen, noise):
        audio, params01 = self._synthesize(batch_num, noise)
        dropout_key = jax.random.fold_in(self._dropout_base, state.step)
        loss_kind = self.cfg.audio_to_params.get("loss", "embedding")

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            pred_params, repr_loss, frozen_loss, mutated = self._shared(
                frozen, variables, audio, params01, train=True, dropout_key=dropout_key
            )
            def mel_l1_component():
                # backprop through the synth: render the predicted patch and match
                # mel spectrograms. self._render is the fused Pallas kernel on TPU —
                # differentiable via its custom VJP (synth/voice.py), ~10x the jnp
                # path — and the jnp fallback elsewhere; both are differentiable.
                #
                # audio_to_params.mel_rows (optional int): compute this term on the
                # leading N rows only. Every batch is freshly sampled random voices,
                # so a prefix is an unbiased sample of the batch — this bounds the
                # [rows, frames, bins] DFT residuals that would otherwise OOM the
                # grad loop at the reference's batch 1024 on a 16 GB chip.
                rows = self.cfg.audio_to_params.get("mel_rows")
                pp, ta = pred_params, audio[:, 0, :]
                if rows and rows < pp.shape[0]:
                    pp, ta = pp[:rows], ta[:rows]
                nz = noise[: pp.shape[0]]
                chunk = self.cfg.audio_to_params.get("mel_chunk")
                if chunk and chunk < pp.shape[0]:
                    # audio_to_params.mel_chunk: EXACT full-batch alternative to
                    # mel_rows — evaluate the term in row chunks under
                    # jax.checkpoint, so the grad loop holds one chunk's
                    # render/DFT residuals at a time (recomputed in the backward)
                    # instead of the whole batch's. Rows are independent and
                    # chunks equal-sized, so mean-of-chunk-means == the unchunked
                    # mean, and each chunk carries its own noise rows (the buffer
                    # is position-keyed), so rendered values are bit-identical to
                    # the unchunked call. Under a data mesh the semantics are
                    # GLOBAL-batch row chunks: the reshape splits the logical
                    # batch and each chunk's render/mel runs over the mesh like
                    # any other batch-sharded op (equivalence pinned by
                    # tests/test_cross_mesh.py::test_downstream_step_equivalent_
                    # across_meshes[combined_mel_chunk]).
                    b = pp.shape[0]
                    if b % chunk:
                        raise ValueError(
                            f"mel_chunk={chunk} must divide the mel-term batch {b}"
                        )
                    n = b // chunk

                    def body(xs):
                        ppc, tac, nc = xs
                        pa = self._render(ppc.astype(jnp.float32), nc)
                        m = self.mel(jnp.stack([pa, tac]))
                        return jnp.mean(jnp.abs(m[0] - m[1]))

                    vals = jax.lax.map(
                        jax.checkpoint(body),
                        (
                            pp.reshape(n, chunk, pp.shape[1]),
                            ta.reshape(n, chunk, ta.shape[1]),
                            nz.reshape(n, chunk, nz.shape[1]),
                        ),
                    )
                    return jnp.mean(vals)
                pred_audio = self._render(pp.astype(jnp.float32), nz)
                # one stacked mel call: single framing + DFT matmul for both signals
                m = self.mel(jnp.stack([pred_audio, ta]))
                return jnp.mean(jnp.abs(m[0] - m[1]))

            components = {
                "mel_l1": mel_l1_component,
                "param_mse": lambda: jnp.mean(
                    (pred_params.astype(jnp.float32) - params01) ** 2
                ),
                "embedding": lambda: repr_loss,
            }
            aux_components = {}
            if loss_kind == "combined":
                # static config → the set of component programs is fixed at trace time
                weights = dict(
                    self.cfg.audio_to_params.get("loss_weights")
                    or {"param_mse": 1.0, "mel_l1": 0.1}
                )
                loss = jnp.float32(0.0)
                for name, w in weights.items():
                    if not w:
                        continue
                    value = components[name]()
                    aux_components[name] = value
                    loss = loss + w * value
            else:
                loss = components.get(loss_kind, components["embedding"])()
            # Identity-norm heads create no batch_stats collection
            return loss, (
                mutated.get("batch_stats", state.batch_stats),
                frozen_loss,
                aux_components,
            )

        (loss, (new_stats, frozen_loss, aux_components)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = maybe_bf16_grads(self.cfg, grads)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics = {
            "audio_to_params/train/loss": loss,
            "audio_to_params/train/frozen_vicreg_loss": frozen_loss,
        }
        for name, value in aux_components.items():
            metrics[f"audio_to_params/train/{name}"] = value
        return state, metrics

    def _test_predict_impl(self, state: TrainState, batch_num, frozen, noise):
        audio, params01 = self._synthesize(batch_num, noise)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred_params, repr_loss, frozen_loss, _ = self._shared(
            frozen, variables, audio, params01, train=False
        )
        return audio[:, 0, :], params01, pred_params, repr_loss, frozen_loss

    def _test_metrics_impl(self, true_audio, params01, pred_params, noise):
        # resynthesize from predicted params — a pure function call
        pred_audio = self._render(pred_params.astype(jnp.float32), noise)
        # one stacked mel call for pred / true; fp32-honest test path (see __init__)
        mels = self.mel_test(jnp.stack([pred_audio, true_audio]))
        mrstft, mrstft_silence = multi_resolution_stft_loss(
            pred_audio, true_audio, method=self._test_spectral_method,
            return_silence_baseline=True,
        )
        metrics = {
            "audio_to_params/test/mel_l1": jnp.mean(jnp.abs(mels[0] - mels[1])),
            "audio_to_params/test/mrstft": mrstft,
            "audio_to_params/test/param_mae": jnp.mean(
                jnp.abs(pred_params - params01)
            ),
            # trivial-baseline floors: every headline metric must beat these to mean
            # anything (constant-0.5 params ⇒ expected MAE 0.25 on uniform [0,1];
            # silence ⇒ the spectral distance of predicting nothing). Both silence
            # baselines are analytic functions of the TRUE spectra already computed
            # (|silence| = 0 exactly), costing no extra DFT passes.
            "audio_to_params/baseline/param_mae_const05": jnp.mean(
                jnp.abs(0.5 - params01)
            ),
            "audio_to_params/baseline/mel_l1_silence": jnp.mean(jnp.abs(mels[1])),
            "audio_to_params/baseline/mrstft_silence": mrstft_silence,
            # [nparams] vector (not a logged scalar — the CLI writes it as CSV):
            # identifiable params (pitch, gains, envelope times) should sit far
            # below the 0.25 chance floor while structurally unidentifiable ones
            # (e.g. params behind a zeroed mixer level) stay near it
            "audio_to_params/test/param_mae_per_param": jnp.mean(
                jnp.abs(pred_params - params01), axis=0
            ),
            # matching per-param chance floor (same test voices), so the CSV can
            # show learned-vs-chance per parameter without a separate pass
            "audio_to_params/baseline/param_mae_per_param_const05": jnp.mean(
                jnp.abs(0.5 - params01), axis=0
            ),
        }
        return metrics, pred_audio

    def _test_full_impl(self, state: TrainState, batch_num, frozen, noise):
        true_audio, params01, pred_params, repr_loss, frozen_loss = (
            self._test_predict_impl(state, batch_num, frozen, noise)
        )
        metrics, pred_audio = self._test_metrics_impl(
            true_audio, params01, pred_params, noise
        )
        metrics = {
            "audio_to_params/test/loss": repr_loss,
            "audio_to_params/test/frozen_vicreg_loss": frozen_loss,
            **metrics,
        }
        return metrics, true_audio, pred_audio

    def test_step(self, state: TrainState, batch_num):
        if self._test_fused_ok is not False:
            try:
                out = self._test_full(state, batch_num, self.frozen, self._noise)
                if not self._test_fused_ok:
                    # materialize before declaring the fused program viable: an
                    # async execution-time error on the first batch must land HERE
                    # (where the fallback can catch it), not escape as a poisoned
                    # future after _test_fused_ok is already True
                    jax.block_until_ready(out)
                self._test_fused_ok = True
                return out
            except (jax.errors.JaxRuntimeError, RuntimeError, ValueError) as e:
                # only first-call compile/HLO-size/OOM failures downgrade to the
                # two-program split; anything after a successful fused call is a
                # real error and must surface
                if self._test_fused_ok:
                    raise
                import logging

                logging.getLogger(__name__).info(
                    "fused test program failed on first call (%r); using the "
                    "two-program split",
                    e,
                )
                self._test_fused_ok = False
        true_audio, params01, pred_params, repr_loss, frozen_loss = self._test_predict(
            state, batch_num, self.frozen, self._noise
        )
        metrics, pred_audio = self._test_metrics(
            true_audio, params01, pred_params, self._noise
        )
        metrics = {
            "audio_to_params/test/loss": repr_loss,
            "audio_to_params/test/frozen_vicreg_loss": frozen_loss,
            **metrics,
        }
        return metrics, true_audio, pred_audio

    # -- audio logging (reference: audio_to_params.py:260-273) ----------------------
    def log_audio_triplets(self, logger, true_audio, pred_audio, batch_idx, n: int = 16):
        import numpy as np

        rate = self.cfg.torchsynth.rate
        silence = np.zeros(rate // 2, dtype=np.float32)
        n = min(n, true_audio.shape[0])
        for i in range(n):
            clip = np.concatenate(
                [np.asarray(true_audio[i]), silence, np.asarray(pred_audio[i])]
            )
            logger.log_audio(f"audio-test/{batch_idx}/{i}", clip, rate)

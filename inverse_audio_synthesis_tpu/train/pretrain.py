"""VICReg pretraining task: seed → synth → towers → loss → grads, one jitted program.

TPU-native counterpart of the reference's ``VicregAudioParams`` LightningModule
(reference: vicreg_audio_params.py:33-165). The reference's per-step pattern — move the
batch number to CPU, call a stateful Voice, run forward, log with sync_dist
(vicreg_audio_params.py:107-122) — becomes a single pure ``train_step(state,
batch_num)`` compiled over the device mesh: the batch number stays on device, the
synthesizer runs as part of the same XLA program, gradients and the VICReg global-batch
statistics reduce over ICI, and there are zero host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
from flax.training import train_state

from inverse_audio_synthesis_tpu.models import (
    AudioEmbedding,
    ParamEmbed,
    VICRegModule,
    vicreg_loss,
)
from inverse_audio_synthesis_tpu.models.vicreg import parse_projector_spec
from inverse_audio_synthesis_tpu.parallel.mesh import param_shardings, shard_batch
from inverse_audio_synthesis_tpu.synth import SynthConfig
from inverse_audio_synthesis_tpu.synth.voice import sample_voice_params
from inverse_audio_synthesis_tpu.train.optim import make_optimizer

_WARNED_RANDOM_INIT = False


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def maybe_bf16_grads(cfg, grads):
    """Cast ≥2-D weight gradients to bf16 when ``grads_bf16`` is on (and towers run
    bf16). Inside the jitted step XLA folds the convert into the producing backward
    matmuls, so the gradients are WRITTEN as bf16 — halving backward grad-write and
    optimizer grad-read HBM traffic on the 143M-param full config. fused_lars
    accumulates its norm scalars in fp32 regardless of gradient dtype."""
    if cfg.get("precision") == "bf16" and cfg.get("grads_bf16", False):
        return jax.tree_util.tree_map(
            lambda g: g.astype(jnp.bfloat16) if g.ndim >= 2 else g, grads
        )
    return grads


def make_render_fn(synth_cfg: SynthConfig, mesh, bwd: str = "pallas"):
    """Returns ``(render, noise_buf)`` for this mesh: ``render(params01, noise)`` is
    the fused Pallas kernel on TPU (shard_mapped over the 'data' axis when the mesh
    has >1 data shard, with noise rows keyed by global row index); otherwise the jnp
    path. Logs the chosen path once so a config drift that silently drops the ~10x
    kernel is visible in run logs (e.g. a control_rate change pushing the upsample
    ratio out of [2, 128]).

    The fixed-seed noise buffer is generated ONCE here, mirroring torchsynth's
    pre-generated Voice noise buffer: regenerating it inside the jitted step costs a
    [B, 176400] threefry per step (and a second one in the fused kernel's jnp-path
    backward). Values are identical either way (modules.noise is position-keyed).
    Callers may render a smaller batch (e.g. the downstream mel-term row chunk);
    render slices the leading rows, which reproduces the smaller buffer exactly.

    The buffer MUST enter the jitted step as a runtime ARGUMENT, never a closure:
    jit bakes closed-over arrays into the HLO as literal constants, and at the
    reference's batch 1024 the [1024, 176400] fp32 buffer is a 722 MB literal —
    breaking the remote-compile request limit (the same hazard train/downstream.py
    documents for the frozen towers). Hence the explicit ``noise`` parameter."""
    import logging

    import jax

    from inverse_audio_synthesis_tpu.parallel.mesh import shard_batch
    from inverse_audio_synthesis_tpu.synth import modules
    from inverse_audio_synthesis_tpu.synth.voice import (
        fused_render_available,
        render_voice,
        render_voice_fused,
    )

    log = logging.getLogger(__name__)
    noise_buf = jax.jit(modules.noise, static_argnums=(1, 2))(
        jax.random.PRNGKey(synth_cfg.noise_seed),
        synth_cfg.batch_size,
        synth_cfg.buffer_size,
    )
    noise_buf = shard_batch(noise_buf, mesh)
    if fused_render_available(synth_cfg) and jax.default_backend() == "tpu":
        data_shards = mesh.shape["data"]
        log.info(
            "render path: fused Pallas kernel (data shards=%d%s)",
            data_shards,
            ", shard_map" if data_shards > 1 else "",
        )
        shard_mesh = mesh if data_shards > 1 else None
        # bwd="pallas" (default): gradient via the fused Pallas backward kernel;
        # "jnp" = the pre-round-5 full-re-render VJP escape hatch
        # (cfg.torchsynth.render_bwd)
        return (
            lambda p, noise: render_voice_fused(
                p, synth_cfg, False, shard_mesh, noise, bwd=bwd
            ),
            noise_buf,
        )
    log.info(
        "render path: jnp fallback (backend=%s, fused geometry supported=%s) — "
        "~10x slower than the fused Pallas kernel",
        jax.default_backend(),
        fused_render_available(synth_cfg),
    )
    return (
        lambda p, noise: render_voice(p, synth_cfg, noise=noise[: p.shape[0]]),
        noise_buf,
    )


def synth_config_from_cfg(cfg, batch_size: int) -> SynthConfig:
    scfg = SynthConfig(
        batch_size=batch_size,
        reproducible=cfg.torchsynth.reproducible,
        sample_rate=cfg.torchsynth.rate,
        buffer_size_seconds=cfg.torchsynth.buffer_size_seconds,
        control_rate=cfg.torchsynth.get("control_rate", 441),
        seed=cfg.seed,
    )
    expected = 3 * cfg.image.height * cfg.image.width
    assert scfg.buffer_size == expected, (
        f"torchsynth buffer ({scfg.buffer_size} samples) must tile the PQMF "
        f"pseudo-image: 3×{cfg.image.height}×{cfg.image.width} = {expected}"
    )
    return scfg


def build_vicreg_model(cfg) -> VICRegModule:
    dtype = jnp.bfloat16 if cfg.get("precision") == "bf16" else jnp.float32
    # bn_bf16 additionally runs BatchNorm's normalized OUTPUT in bf16 (batch
    # statistics stay fp32 inside flax) — halves the BN/activation HBM traffic
    # of the MobileNet trunk under mixed precision
    bn_dtype = dtype if cfg.get("bn_bf16", False) else jnp.float32
    return VICRegModule(
        backbone_audio=AudioEmbedding(
            dim=cfg.dim,
            image_size=(cfg.image.height, cfg.image.width),
            dtype=dtype,
            bn_dtype=bn_dtype,
        ),
        backbone_param=ParamEmbed(
            nparams=cfg.nparams,
            dim=cfg.dim,
            hidden_norm=cfg.param_embed.hidden_norm,
            dropout=cfg.param_embed.dropout,
            dtype=dtype,
        ),
        projector_dims=parse_projector_spec(cfg.vicreg.mlp, cfg.dim, cfg.embeddim),
        dtype=dtype,
        bn_dtype=bn_dtype,
    )


class VicregPretrainTask:
    """Owns model/optimizer/synth configs and the compiled train/val steps."""

    def __init__(self, cfg, mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.synth = synth_config_from_cfg(cfg, cfg.vicreg.batch_size)
        self.model = build_vicreg_model(cfg)
        self.tx, self.schedule = make_optimizer(
            cfg.vicreg.optim, cfg.vicreg.batch_size, cfg.vicreg.get("scheduler")
        )
        # cfg.weights_bf16: store the apply weights in bf16 (halving the dominant
        # weight-read HBM traffic of the byte-saturated step) with an fp32 master
        # copy inside the optimizer state (train/optim.with_fp32_master)
        self._weights_bf16 = bool(cfg.get("weights_bf16", False))
        if self._weights_bf16:
            from inverse_audio_synthesis_tpu.train.optim import with_fp32_master

            self.tx = with_fp32_master(self.tx)
        # noise buffer rides the jit boundary as an ARGUMENT (make_render_fn's
        # docstring: a closure would bake it into the HLO as a 722 MB literal at
        # the reference's b1024)
        self._render, self._noise = make_render_fn(
            self.synth, mesh, bwd=cfg.torchsynth.get("render_bwd", "pallas")
        )
        self._dropout_base = jax.random.PRNGKey(cfg.seed + 1)
        self._train_step_jit = jax.jit(self._train_step, donate_argnums=0)
        self._train_multi_jit = jax.jit(self._train_step_multi, donate_argnums=0)
        self._val_step_jit = jax.jit(self._eval_step)

    def train_step(self, state: TrainState, batch_num):
        return self._train_step_jit(state, batch_num, self._noise)

    def _train_step_multi(self, state: TrainState, batch_nums, noise):
        """k train steps as ONE program (lax.scan over batch numbers; metrics
        stacked [k]). At the reference's b16 operating point
        (conf/vicreg/full.yaml:6) a single step is ~15 ms of which ~2 ms is
        compute — the rest is the per-dispatch host round trip through the TPU
        tunnel; scanning k steps per dispatch amortizes that floor
        (cfg.steps_per_dispatch, train/loop.py)."""

        def body(s, bn):
            return self._train_step(s, bn, noise)

        return jax.lax.scan(body, state, batch_nums)

    def train_step_multi(self, state: TrainState, batch_nums):
        return self._train_multi_jit(
            state, jnp.asarray(batch_nums, jnp.int32), self._noise
        )

    def val_step(self, state: TrainState, batch_num):
        return self._val_step_jit(state, batch_num, self._noise)

    # -- state -----------------------------------------------------------------
    def init_state(self, key: Optional[jax.Array] = None) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        audio = jnp.zeros((2, 1, self.synth.buffer_size), jnp.float32)
        params01 = jnp.zeros((2, self.cfg.nparams), jnp.float32)
        variables = jax.jit(partial(self.model.init, train=False))(key, audio, params01)
        variables = self._maybe_load_vision_weights(variables)
        params = variables["params"]
        if self._weights_bf16:
            # bf16 storage for ≥2-D weights; 1-D leaves (biases, BN scale/bias)
            # stay fp32 — negligible bytes, and BN statistics are fp32-sensitive
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params
            )
        state = TrainState.create(
            apply_fn=self.model.apply,
            params=params,
            tx=self.tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        # place (possibly TP-sharded) onto the mesh; opt_state mirrors param paths
        return jax.device_put(state, param_shardings(state, self.mesh))

    def _maybe_load_vision_weights(self, variables):
        """Replace the random-init MobileNetV3 trunk with converted torchvision
        weights when ``vicreg.vision_weights_path`` is set (reference trains from
        ImageNet init: vicreg_audio_params.py:52-54, conf/vicreg/full.yaml:28)."""
        import logging

        log = logging.getLogger(__name__)
        path = self.cfg.vicreg.get("vision_weights_path")
        if path:
            from inverse_audio_synthesis_tpu.models.torch_import import (
                load_into_audio_embedding,
                load_vision_weights_file,
            )

            converted = load_vision_weights_file(path)
            variables = load_into_audio_embedding(
                variables, converted, prefix=("backbone_audio", "vision_model")
            )
            log.info("loaded pretrained vision trunk from %s", path)
        elif self.cfg.vicreg.get("pretrained_vision_model"):
            # once per process: task construction happens once per CLI run but
            # several times in bench/dryrun drivers, where the repeats drowned the
            # signal lines in the recorded artifact tails
            global _WARNED_RANDOM_INIT
            if not _WARNED_RANDOM_INIT:
                _WARNED_RANDOM_INIT = True
                log.warning(
                    "pretrained_vision_model=true but vicreg.vision_weights_path is "
                    "unset — the vision trunk is RANDOM-INIT. Convert torchvision "
                    "weights with `python -m inverse_audio_synthesis_tpu.models."
                    "torch_import` and set the path."
                )
        return variables

    # -- steps -------------------------------------------------------------------
    def _synthesize(self, batch_num, noise):
        params01 = sample_voice_params(batch_num, self.synth)
        params01 = shard_batch(params01, self.mesh)
        audio = shard_batch(self._render(params01, noise), self.mesh)
        return audio[:, None, :], params01

    def _losses(self, x, y):
        # towers may run bf16 on the MXU; the loss statistics reduce in fp32. When
        # towers are bf16, the covariance matmul operands stay bf16 too (fp32 accum) —
        # the two embeddim×embeddim dots dominate the loss cost otherwise.
        bf16_towers = self.cfg.get("precision") == "bf16"
        return vicreg_loss(
            x.astype(jnp.float32),
            y.astype(jnp.float32),
            sim_coeff=self.cfg.vicreg.sim_coeff,
            std_coeff=self.cfg.vicreg.std_coeff,
            cov_coeff=self.cfg.vicreg.cov_coeff,
            cov_operand_dtype=jnp.bfloat16 if bf16_towers else None,
        )

    def _train_step(
        self, state: TrainState, batch_num, noise
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        audio, params01 = self._synthesize(batch_num, noise)
        dropout_key = jax.random.fold_in(self._dropout_base, state.step)

        def loss_fn(params):
            (x, y), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                audio,
                params01,
                train=True,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            loss, repr_l, std_l, cov_l = self._losses(x, y)
            # Identity-norm configs create no batch_stats collection
            return loss, (mutated.get("batch_stats", state.batch_stats), repr_l, std_l, cov_l)

        (loss, (new_stats, repr_l, std_l, cov_l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = maybe_bf16_grads(self.cfg, grads)
        # lr of the update being applied (before apply_gradients bumps step)
        lr = (
            self.schedule(state.step)
            if callable(self.schedule)
            else jnp.asarray(self.schedule)
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics = {
            "vicreg/train/loss": loss,
            "vicreg/train/repr_loss": repr_l,
            "vicreg/train/std_loss": std_l,
            "vicreg/train/cov_loss": cov_l,
            "lr": lr,
        }
        return state, metrics

    def _eval_step(self, state: TrainState, batch_num, noise) -> Dict[str, jax.Array]:
        audio, params01 = self._synthesize(batch_num, noise)
        x, y = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            audio,
            params01,
            train=False,
        )
        loss, repr_l, std_l, cov_l = self._losses(x, y)
        return {
            "vicreg/validation/loss": loss,
            "vicreg/validation/repr_loss": repr_l,
            "vicreg/validation/std_loss": std_l,
            "vicreg/validation/cov_loss": cov_l,
        }

    # -- embedding API (heareval surface, reference: heareval.py:14-15) -----------
    def embed_audio(self, state: TrainState, audio) -> jax.Array:
        if not hasattr(self, "_embed_audio_jit"):
            self._embed_audio_jit = jax.jit(
                lambda variables, a: self.model.apply(
                    variables, a, train=False, method=self.model.audio_repr
                )
            )
        return self._embed_audio_jit(
            {"params": state.params, "batch_stats": state.batch_stats}, audio
        )

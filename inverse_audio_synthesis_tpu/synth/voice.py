"""The Voice synthesizer: 78 normalized parameters → batched 4 s audio, as one pure
jittable function.

This is the TPU-native replacement for the torchsynth ``Voice`` the reference drives
in every workload (reference: vicreg_audio_params.py:86-94,114;
audio_to_params.py:196-203,215,240-257; evaluate_audio_representations.py:91-108).
Architecture (torchsynth-1.0 Voice patch, reconstructed — torchsynth is not
installable in this environment):

    keyboard (midi_f0, duration)
    ├── adsr_1, adsr_2                         — modulation envelopes
    ├── lfo_1, lfo_2                           — rate-modulated by lfo_{1,2}_rate_adsr,
    │                                            amplitude-enveloped by lfo_{1,2}_amp_adsr
    ├── mod_matrix (4 in × 5 out)              — routes {adsr_1, adsr_2, lfo_1, lfo_2} to
    │                                            {vco_1_pitch, vco_1_amp, vco_2_pitch,
    │                                             vco_2_amp, noise_amp}
    ├── vco_1 (sine), vco_2 (square↔saw), noise
    └── vca + audio mixer (3 channels)         → [B, 176400] @ 44.1 kHz

Parameter count: 2 + 6·5 (ADSRs) + 2·8 (LFOs) + 20 (mod matrix) + 3 + 4 + 3 = 78,
matching cfg.nparams (reference: conf/config.yaml:27). Parameter ordering matches
torchsynth's ``voice.get_parameters()`` registration order, which the downstream task
relies on to write predicted parameters back (reference: audio_to_params.py:240-246).

Design stance (SURVEY.md §7): instead of a stateful nn.Module mutated via
``set_parameter_0to1``, the synth is ``params01 = sample(key)`` + ``audio =
render(params01)`` — both pure, so the downstream resynthesis path is simply
``render(predicted_params)`` inside the same jitted program.

Known deviations from torchsynth (documented, unavoidable or intentional):
- PRNG streams differ (JAX threefry vs torch); determinism contract preserved:
  identical batch_num → identical (params, audio).
- ``is_train`` uses a deterministic per-sample 90/10 interleave; the reference never
  consumes this output.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inverse_audio_synthesis_tpu.synth import modules
from inverse_audio_synthesis_tpu.synth.config import SynthConfig
from inverse_audio_synthesis_tpu.synth.parameter import ParamSpec, from_0to1

_PI = float(np.pi)


def _adsr_specs(module: str) -> Tuple[ParamSpec, ...]:
    return (
        ParamSpec(module, "attack", 0.0, 2.0, curve=0.5),
        ParamSpec(module, "decay", 0.0, 2.0, curve=0.5),
        ParamSpec(module, "sustain", 0.0, 1.0),
        ParamSpec(module, "release", 0.0, 5.0, curve=0.5),
        ParamSpec(module, "alpha", 0.1, 6.0),
    )


def _lfo_specs(module: str) -> Tuple[ParamSpec, ...]:
    return (
        ParamSpec(module, "frequency", 0.0, 20.0, curve=0.25),
        ParamSpec(module, "mod_depth", -10.0, 20.0, curve=0.5, symmetric=True),
        ParamSpec(module, "initial_phase", -_PI, _PI),
        ParamSpec(module, "sin", 0.0, 1.0),
        ParamSpec(module, "tri", 0.0, 1.0),
        ParamSpec(module, "saw", 0.0, 1.0),
        ParamSpec(module, "rsaw", 0.0, 1.0),
        ParamSpec(module, "sqr", 0.0, 1.0),
    )


MOD_MATRIX_INPUTS = ("adsr_1", "adsr_2", "lfo_1", "lfo_2")
MOD_MATRIX_OUTPUTS = (
    "vco_1_pitch",
    "vco_1_amp",
    "vco_2_pitch",
    "vco_2_amp",
    "noise_amp",
)


def _build_voice_specs() -> Tuple[ParamSpec, ...]:
    specs = [
        ParamSpec("keyboard", "midi_f0", 0.0, 127.0),
        ParamSpec("keyboard", "duration", 0.01, 4.0, curve=0.5),
    ]
    specs += list(_adsr_specs("adsr_1"))
    specs += list(_adsr_specs("adsr_2"))
    specs += list(_lfo_specs("lfo_1"))
    specs += list(_lfo_specs("lfo_2"))
    specs += list(_adsr_specs("lfo_1_amp_adsr"))
    specs += list(_adsr_specs("lfo_2_amp_adsr"))
    specs += list(_adsr_specs("lfo_1_rate_adsr"))
    specs += list(_adsr_specs("lfo_2_rate_adsr"))
    for inp in MOD_MATRIX_INPUTS:
        for out in MOD_MATRIX_OUTPUTS:
            specs.append(ParamSpec("mod_matrix", f"{inp}->{out}", 0.0, 1.0, curve=0.5))
    specs += [
        ParamSpec("vco_1", "tuning", -24.0, 24.0),
        ParamSpec("vco_1", "mod_depth", -96.0, 96.0, curve=0.2, symmetric=True),
        ParamSpec("vco_1", "initial_phase", -_PI, _PI),
        ParamSpec("vco_2", "tuning", -24.0, 24.0),
        ParamSpec("vco_2", "mod_depth", -96.0, 96.0, curve=0.2, symmetric=True),
        ParamSpec("vco_2", "initial_phase", -_PI, _PI),
        ParamSpec("vco_2", "shape", 0.0, 1.0),
        ParamSpec("mixer", "vco_1", 0.0, 1.0),
        ParamSpec("mixer", "vco_2", 0.0, 1.0),
        # noise level uses a strong curve so random patches are rarely noise-dominated
        ParamSpec("mixer", "noise", 0.0, 1.0, curve=0.025),
    ]
    return tuple(specs)


VOICE_PARAM_SPECS: Tuple[ParamSpec, ...] = _build_voice_specs()
assert len(VOICE_PARAM_SPECS) == 78

_INDEX = {(s.module, s.name): i for i, s in enumerate(VOICE_PARAM_SPECS)}


def _natural(params01: jax.Array) -> Dict[str, Dict[str, jax.Array]]:
    """[B, 78] normalized → {module: {name: [B] natural units}}."""
    out: Dict[str, Dict[str, jax.Array]] = {}
    for i, spec in enumerate(VOICE_PARAM_SPECS):
        out.setdefault(spec.module, {})[spec.name] = from_0to1(spec, params01[:, i])
    return out


def compute_controls(params01: jax.Array, config: SynthConfig):
    """Control-rate half of the Voice graph (cheap: [B, 5, Tc] + per-voice scalars).

    Returns (natural_params, routed [B, 5, Tc], midi_f0 [B]). The audio-rate half
    (upsample → VCOs → VCA → mix) consumes this — either the jnp path below or the
    fused Pallas kernel (ops/pallas/render.py)."""
    assert params01.ndim == 2 and params01.shape[1] == len(VOICE_PARAM_SPECS)
    cr = float(config.control_rate)
    tc = config.control_buffer_size
    p = _natural(params01.astype(jnp.float32))

    midi_f0 = p["keyboard"]["midi_f0"]
    note_on = p["keyboard"]["duration"]

    def env(module: str) -> jax.Array:
        return modules.adsr_envelope(p[module], note_on, tc, cr)

    lfo_1 = modules.lfo(p["lfo_1"], env("lfo_1_rate_adsr"), cr) * jnp.maximum(
        env("lfo_1_amp_adsr"), 0.0
    )
    lfo_2 = modules.lfo(p["lfo_2"], env("lfo_2_rate_adsr"), cr) * jnp.maximum(
        env("lfo_2_amp_adsr"), 0.0
    )

    mods = jnp.stack([env("adsr_1"), env("adsr_2"), lfo_1, lfo_2], axis=1)  # [B,4,Tc]
    w = jnp.stack(
        [
            jnp.stack([p["mod_matrix"][f"{inp}->{out}"] for out in MOD_MATRIX_OUTPUTS], 1)
            for inp in MOD_MATRIX_INPUTS
        ],
        axis=1,
    )  # [B, 4, 5]
    routed = modules.modulation_mixer(w, mods)  # [B, 5, Tc]
    return p, routed, midi_f0


def render_voice(
    params01: jax.Array, config: SynthConfig, noise: Optional[jax.Array] = None
) -> jax.Array:
    """[B, 78] normalized params → [B, buffer_size] audio. Pure; jit/vmap/grad-safe.

    ``noise`` optionally overrides the fixed-seed noise buffer (used by callers that
    chunk a large batch and want distinct noise rows per chunk)."""
    sr = float(config.sample_rate)
    ta = config.buffer_size
    b = params01.shape[0]
    p, routed, midi_f0 = compute_controls(params01, config)

    # upsample each routed signal separately (packing + slicing the stack makes XLA
    # rematerialize the whole control graph per consumer)
    up = [modules.upsample_control(routed[:, i], ta) for i in range(5)]
    vco_1_pitch, vco_1_amp, vco_2_pitch, vco_2_amp, noise_amp = up

    vco_1 = modules.vca(
        modules.sine_vco(p["vco_1"], midi_f0, vco_1_pitch, sr), vco_1_amp
    )
    vco_2 = modules.vca(
        modules.square_saw_vco(p["vco_2"], midi_f0, vco_2_pitch, sr), vco_2_amp
    )
    if noise is None:
        noise = modules.noise(jax.random.PRNGKey(config.noise_seed), b, ta)
    noise_sig = modules.vca(noise, noise_amp)

    levels = jnp.stack(
        [p["mixer"]["vco_1"], p["mixer"]["vco_2"], p["mixer"]["noise"]], axis=1
    )
    return modules.audio_mixer(levels, jnp.stack([vco_1, vco_2, noise_sig], axis=1))


def _fused_scalars(p, midi_f0: jax.Array) -> jax.Array:
    """Pack the per-voice scalars the fused kernel consumes ([B, 16])."""
    base1 = midi_f0 + p["vco_1"]["tuning"]
    base2 = midi_f0 + p["vco_2"]["tuning"]
    partials = modules.squaresaw_partials(
        midi_f0, p["vco_2"]["tuning"], p["vco_2"]["mod_depth"]
    )
    cols = [
        base1,
        p["vco_1"]["mod_depth"],
        p["vco_1"]["initial_phase"],
        base2,
        p["vco_2"]["mod_depth"],
        p["vco_2"]["initial_phase"],
        p["vco_2"]["shape"],
        partials,
        p["mixer"]["vco_1"],
        p["mixer"]["vco_2"],
        p["mixer"]["noise"],
    ]
    out = jnp.stack(cols, axis=1)
    return jnp.pad(out, ((0, 0), (0, 16 - out.shape[1])))


# -- audio-rate custom VJP boundary ------------------------------------------------
# The custom_vjp sits at the AUDIO-RATE boundary (routed controls + packed scalars
# + noise → audio): forward is the fused Pallas kernel, backward is the fused Pallas
# BACKWARD kernel (ops/pallas/render.py:_bwd_kernel — one HBM pass over (noise, g),
# reverse-time suffix-sum carry, in-VMEM phase recompute from saved carry
# snapshots). Cotangents w.r.t. the control-rate half (ADSRs, LFOs, mod matrix —
# compute_controls/_fused_scalars) flow through ordinary jnp autodiff: those arrays
# are 100× smaller than audio rate, so their VJP is cheap. Through round 4 the
# backward instead re-rendered the whole jnp path (~10× the kernel's cost).


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_audio(routed, scalars, noise, sample_rate: float, interpret: bool):
    from inverse_audio_synthesis_tpu.ops.pallas.render import render_audio_fused

    return render_audio_fused(routed, scalars, noise, sample_rate, interpret)


def _fused_audio_fwd(routed, scalars, noise, sample_rate, interpret):
    from inverse_audio_synthesis_tpu.ops.pallas.render import render_audio_fused

    audio, carries = render_audio_fused(
        routed, scalars, noise, sample_rate, interpret, save_carries=True
    )
    return audio, (routed, scalars, noise, carries)


def _fused_audio_bwd(sample_rate, interpret, res, g):
    from inverse_audio_synthesis_tpu.ops.pallas.render import render_audio_fused_bwd

    routed, scalars, noise, carries = res
    d_routed, d_scalars = render_audio_fused_bwd(
        routed, scalars, noise, g, carries, sample_rate, interpret
    )
    # noise is a fixed buffer, never a differentiation target — the zero cotangent
    # is dead at every call site and DCE'd by XLA
    return d_routed, d_scalars, jnp.zeros_like(noise)


_fused_audio.defvjp(_fused_audio_fwd, _fused_audio_bwd)


def _render_voice_fused_impl(
    params01, noise, config: SynthConfig, interpret: bool, mesh=None
):
    render = partial(
        _fused_audio, sample_rate=float(config.sample_rate), interpret=interpret
    )
    p, routed, midi_f0 = compute_controls(params01, config)
    scalars = _fused_scalars(p, midi_f0)
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        # A raw pallas_call cannot be GSPMD-auto-partitioned; shard_map runs one
        # kernel instance per data shard on its local batch rows (forward AND
        # backward — the custom_vjp lives inside the shard_map body). The render
        # is embarrassingly batch-parallel — no collectives. check_vma=False
        # because replication along the 'model' axis can't be inferred through
        # pallas_call.
        from jax.sharding import PartitionSpec as P

        render = jax.shard_map(
            render,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    return render(routed, scalars, noise)


# -- legacy params-level VJP (backward = full jnp re-render) -----------------------
# Kept as `bwd="jnp"`: the pre-round-5 behavior, useful as an A/B reference and a
# fallback if the backward kernel ever misbehaves on a new geometry/toolchain.


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _render_voice_fused_vjp(params01, noise, config: SynthConfig, interpret, mesh):
    return _render_voice_fused_impl(params01, noise, config, interpret, mesh)


def _fused_fwd(params01, noise, config, interpret, mesh):
    out = _render_voice_fused_impl(params01, noise, config, interpret, mesh)
    return out, (params01, noise)


def _fused_bwd(config, interpret, mesh, res, g):
    params01, noise = res
    _, vjp = jax.vjp(lambda q: render_voice(q, config, noise=noise), params01)
    return (vjp(g)[0], jnp.zeros_like(noise))


_render_voice_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def render_voice_fused(
    params01,
    config: SynthConfig,
    interpret: bool = False,
    mesh=None,
    noise=None,
    bwd: str = "pallas",
):
    """Single-HBM-pass Pallas render (see ops/pallas/render.py). Same semantics as
    ``render_voice`` up to float association in the phase integration. Pass ``mesh``
    to shard the kernel over the mesh's 'data' axis via shard_map (multi-chip data
    parallelism).

    ``bwd`` selects the gradient path: "pallas" (default) runs the fused Pallas
    backward kernel (one HBM pass; control-rate cotangents via jnp autodiff);
    "jnp" reproduces the pre-round-5 behavior (backward re-renders the whole jnp
    path — ~10× slower, kept for A/B and as an escape hatch).

    ``noise`` optionally provides the fixed-seed noise buffer (torchsynth
    pre-generates it once at Voice init — /root/reference's torchsynth dependency —
    so a training loop should generate it once and pass it here rather than pay the
    per-step threefry regeneration; values are identical either way). When omitted
    it is generated in the GLOBAL program keyed by global row index, so under a
    data-sharded mesh every shard gets distinct rows (shard-local keying inside the
    shard_map body would duplicate the same noise on every shard)."""
    assert bwd in ("pallas", "jnp"), bwd
    if noise is None:
        noise = modules.noise(
            jax.random.PRNGKey(config.noise_seed), params01.shape[0], config.buffer_size
        )
    else:
        b = params01.shape[0]
        assert noise.shape[0] >= b, (noise.shape, b)
        if noise.shape[0] > b:
            # rows are position-keyed, so the leading slice of a larger cached
            # buffer IS the buffer a b-row call would generate
            noise = noise[:b]
    if bwd == "pallas":
        return _render_voice_fused_impl(params01, noise, config, interpret, mesh)
    return _render_voice_fused_vjp(params01, noise, config, interpret, mesh)


def fused_render_available(config: SynthConfig) -> bool:
    from inverse_audio_synthesis_tpu.ops.pallas.render import fused_render_supported

    return fused_render_supported(
        config.batch_size, config.buffer_size, config.control_buffer_size
    )


def render_fused_with_noise(
    params01, config: SynthConfig, noise: jax.Array, interpret: bool = False
) -> jax.Array:
    """Fused render with a CALLER-PROVIDED noise buffer. Kept as a named entry for
    the retrieval evaluator's candidate stream (noise keyed per sub-chunk position,
    eval/retrieval.py); now a thin alias of ``render_voice_fused(noise=...)``."""
    return render_voice_fused(params01, config, interpret, None, noise)


def render_voice_auto(params01, config: SynthConfig, noise=None) -> jax.Array:
    """Fused Pallas render on TPU when the geometry allows, else the jnp path.
    ``noise`` optionally overrides the fixed-seed noise buffer (see render_voice)."""
    if fused_render_available(config) and jax.default_backend() == "tpu":
        return render_voice_fused(params01, config, False, None, noise)
    return render_voice(params01, config, noise=noise)


def sample_voice_params(batch_num, config: SynthConfig) -> jax.Array:
    """Deterministic per-batch-number parameter draw: [B, 78] uniform in [0, 1]."""
    key = jax.random.fold_in(jax.random.PRNGKey(config.seed), batch_num)
    params01 = jax.random.uniform(
        key, (config.batch_size, len(VOICE_PARAM_SPECS)), dtype=jnp.float32
    )
    # Without a barrier XLA rematerializes the threefry draw into every audio-rate
    # consumer of every parameter (measured 60× slowdown of the fused render on TPU).
    return jax.lax.optimization_barrier(params01)


def is_train_split(batch_num, config: SynthConfig) -> jax.Array:
    """synth1B1-style train/test flag ([B] bool, shared by the whole batch).

    torchsynth's published synth1B1 contract: sounds come in canonical 128-voice
    batches and 10% of batches form the test set, interleaved as every 10th batch —
    ``batch_num % 10 == 0`` is test, the rest train (reconstructed; torchsynth is not
    installable in this environment). The flag is batch-level, matching the
    reference's ``voice(batch_num) -> (audio, params, is_train)`` third output
    (reference: vicreg_audio_params.py:114 — never consumed there)."""
    train = (batch_num % 10) != 0
    return jnp.full((config.batch_size,), train, dtype=bool)


class Voice:
    """Stateful convenience wrapper with the torchsynth call surface.

    ``voice(batch_num)`` → (audio [B, Ta], params01 [B, 78], is_train [B]);
    ``voice(None)`` after ``set_parameter_0to1``/``freeze_parameters`` resynthesizes
    from the currently-set parameters (reference usage: audio_to_params.py:240-257).
    The underlying computation is the pure ``sample_voice_params``/``render_voice`` —
    prefer those inside jitted training code.
    """

    def __init__(self, synthconfig: SynthConfig):
        self.synthconfig = synthconfig
        self._params01 = jnp.full(
            (synthconfig.batch_size, len(VOICE_PARAM_SPECS)), 0.5, dtype=jnp.float32
        )
        self._frozen_mask = jnp.zeros((len(VOICE_PARAM_SPECS),), dtype=bool)
        self._render = jax.jit(lambda p: render_voice_auto(p, self.synthconfig))
        self._sample = jax.jit(lambda n: sample_voice_params(n, self.synthconfig))

    # -- torchsynth-style parameter addressing --------------------------------
    def get_parameters(self) -> "OrderedDict[Tuple[str, str], jax.Array]":
        return OrderedDict(
            ((s.module, s.name), self._params01[:, i])
            for i, s in enumerate(VOICE_PARAM_SPECS)
        )

    def set_parameter_0to1(self, module: str, name: str, value) -> None:
        i = _INDEX[(module, name)]
        self._params01 = self._params01.at[:, i].set(jnp.asarray(value))

    def set_all_parameters_0to1(self, params01) -> None:
        params01 = jnp.asarray(params01, dtype=jnp.float32)
        assert params01.shape == self._params01.shape
        self._params01 = params01

    def freeze_parameters(self, keys=None) -> None:
        """Freeze parameters so subsequent ``voice(batch_num)`` calls keep their
        currently-set values instead of resampling them. ``keys`` is an iterable of
        ``(module, name)`` tuples (torchsynth surface — the reference freezes named
        parameters, audio_to_params.py:240-257); ``None`` freezes all 78. Repeated
        calls accumulate, like torchsynth's per-parameter ``frozen`` flags."""
        if keys is None:
            self._frozen_mask = jnp.ones((len(VOICE_PARAM_SPECS),), dtype=bool)
        else:
            idx = jnp.asarray([_INDEX[tuple(k)] for k in keys], dtype=jnp.int32)
            self._frozen_mask = self._frozen_mask.at[idx].set(True)

    def unfreeze_all_parameters(self) -> None:
        self._frozen_mask = jnp.zeros((len(VOICE_PARAM_SPECS),), dtype=bool)

    # -- synthesis -------------------------------------------------------------
    def __call__(
        self, batch_num: Optional[int]
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if batch_num is not None and not bool(self._frozen_mask.all()):
            fresh = self._sample(batch_num)
            # frozen parameters survive the resample (per-key torchsynth semantics)
            self._params01 = jnp.where(self._frozen_mask[None, :], self._params01, fresh)
            is_train = is_train_split(batch_num, self.synthconfig)
        else:
            is_train = jnp.ones((self.synthconfig.batch_size,), dtype=bool)
        audio = self._render(self._params01)
        return audio, self._params01, is_train

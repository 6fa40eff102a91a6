#!/usr/bin/env python3
"""Portable torchsynth ground-truth parity harness.

This framework's synthesizer is a RECONSTRUCTION of torchsynth-1.0's ``Voice``
(the reference's single most important dependency — /root/reference/
requirements.txt:1, instantiated at vicreg_audio_params.py:86-94 and driven at
audio_to_params.py:240-257): torchsynth is not installable in this zero-egress
environment, so golden tests (tests/test_golden.py) pin self-consistency, not
fidelity. This tool makes fidelity verifiable BY ANYONE with a torchsynth
environment, in two halves:

  export   (runs HERE, no torchsynth needed)
      python tools/torchsynth_parity.py export [--out DIR]
      For fixed probe parameter sets, dump npz artifacts containing:
        - the 78-spec registration table (module, name, min, max, curve, symmetric)
        - probe params01 [B, 78] (deterministic: our sampler at fixed batch
          numbers + corner cases) and their natural-unit values per spec
        - control-rate module outputs (ADSR envelopes, LFOs, routed mod signals)
        - rendered audio (float16 — comparisons are spectral, see below)

  compare  (runs in ANY environment with torchsynth + torch installed)
      python tools/torchsynth_parity.py compare [--probes DIR]
      Loads the same artifacts, builds a real ``torchsynth.synth.Voice``, writes
      the probe params01 through ``set_parameter_0to1`` in OUR registration
      order, resynthesizes via ``freeze_parameters()`` + ``voice(None)``, and
      reports per-check deltas against stated tolerances:
        - registration order/count vs voice.get_parameters() keys      (exact)
        - parameter ranges/curves: torchsynth's from_0to1 of the probe
          values vs our natural-unit values                            (≤1e-4 rel)
        - audio: log-mel-spectrogram L1 and per-frame RMS envelope
          distance between the two renders                             (reported;
          guideline ≤0.5 mel-L1 — waveform-exact comparison is impossible by
          construction: the two engines use different noise-buffer RNGs and
          fp32 phase association, so parity is judged spectrally)

Artifacts produced by `export` are committed under tests/golden/torchsynth_probes/
so the compare half can run against this exact repo state.

Reference call surface being verified: /root/reference/vicreg_audio_params.py:86-94
(SynthConfig/Voice construction), audio_to_params.py:240-257 (get_parameters /
set_parameter_0to1 / freeze_parameters / voice(None)).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROBES_DIR = REPO / "tests" / "golden" / "torchsynth_probes"
PROBE_BATCH = 4  # voices per probe (keeps committed artifacts small)
PROBE_SETS = ("batch0", "batch1", "mid", "corners")
SAMPLE_RATE = 44100
BUFFER_SECONDS = 4.0


# ---------------------------------------------------------------------------
# export half — runs in this repo's environment (JAX, no torchsynth)
# ---------------------------------------------------------------------------


def _probe_params(name: str, nparams: int):
    import jax

    from inverse_audio_synthesis_tpu.synth import SynthConfig
    from inverse_audio_synthesis_tpu.synth.voice import sample_voice_params

    cfg = SynthConfig(
        batch_size=PROBE_BATCH,
        sample_rate=SAMPLE_RATE,
        buffer_size_seconds=BUFFER_SECONDS,
    )
    if name == "batch0":
        return np.asarray(sample_voice_params(0, cfg), np.float32)
    if name == "batch1":
        return np.asarray(sample_voice_params(1, cfg), np.float32)
    if name == "mid":
        # all-0.5: the center of every range — isolates curve-warp conventions
        return np.full((PROBE_BATCH, nparams), 0.5, np.float32)
    if name == "corners":
        # row 0: all 0.25, row 1: all 0.75, rows 2/3: deterministic stripes —
        # exercises both halves of symmetric curves
        out = np.full((PROBE_BATCH, nparams), 0.25, np.float32)
        out[1] = 0.75
        out[2] = (np.arange(nparams) % 4) / 4.0 + 0.1
        out[3] = 1.0 - out[2]
        return out.astype(np.float32)
    raise ValueError(name)


def export(out_dir: Path) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # reproducible anywhere, no TPU needed
    import jax.numpy as jnp

    from inverse_audio_synthesis_tpu.synth import SynthConfig
    from inverse_audio_synthesis_tpu.synth.parameter import from_0to1
    from inverse_audio_synthesis_tpu.synth.voice import (
        VOICE_PARAM_SPECS,
        compute_controls,
        render_voice,
    )

    cfg = SynthConfig(
        batch_size=PROBE_BATCH,
        sample_rate=SAMPLE_RATE,
        buffer_size_seconds=BUFFER_SECONDS,
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    registration = [
        {
            "module": s.module,
            "name": s.name,
            "minimum": s.minimum,
            "maximum": s.maximum,
            "curve": s.curve,
            "symmetric": s.symmetric,
        }
        for s in VOICE_PARAM_SPECS
    ]
    (out_dir / "registration.json").write_text(
        json.dumps(
            {
                "nparams": len(registration),
                "sample_rate": SAMPLE_RATE,
                "buffer_size_seconds": BUFFER_SECONDS,
                "control_rate": cfg.control_rate,
                "specs": registration,
            },
            indent=1,
        )
    )

    for probe in PROBE_SETS:
        params01 = _probe_params(probe, len(VOICE_PARAM_SPECS))
        natural = np.stack(
            [
                np.asarray(from_0to1(spec, jnp.asarray(params01[:, i])), np.float32)
                for i, spec in enumerate(VOICE_PARAM_SPECS)
            ],
            axis=1,
        )  # [B, 78] natural units
        p, routed, midi_f0 = compute_controls(jnp.asarray(params01), cfg)
        audio = np.asarray(render_voice(jnp.asarray(params01), cfg), np.float32)
        np.savez_compressed(
            out_dir / f"probe_{probe}.npz",
            params01=params01,
            natural=natural,
            routed=np.asarray(routed, np.float32),  # [B, 5, Tc] mod-matrix outputs
            midi_f0=np.asarray(midi_f0, np.float32),
            audio=audio.astype(np.float16),  # spectral comparisons only
        )
        print(f"wrote {out_dir / f'probe_{probe}.npz'}  "
              f"(audio rms {np.sqrt(np.mean(audio**2)):.4f})")
    print(f"export complete: {len(PROBE_SETS)} probes in {out_dir}")


# ---------------------------------------------------------------------------
# compare half — runs in a torchsynth environment (torch + torchsynth, no JAX)
# ---------------------------------------------------------------------------


def _log_mel(audio: "np.ndarray", rate: int) -> "np.ndarray":
    """Minimal log-mel via numpy (no torchaudio dependency in the compare env)."""
    n_fft, hop, n_mels = 1024, 512, 128
    window = np.hanning(n_fft).astype(np.float64)
    pad = n_fft // 2
    x = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    frames = 1 + (x.shape[1] - n_fft) // hop
    spec = np.empty((audio.shape[0], frames, n_fft // 2 + 1))
    for f in range(frames):
        seg = x[:, f * hop : f * hop + n_fft] * window
        spec[:, f] = np.abs(np.fft.rfft(seg, axis=1)) ** 2
    # HTK mel filterbank
    def hz_to_mel(h):
        return 2595.0 * np.log10(1.0 + h / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(rate / 2), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / rate).astype(int)
    fb = np.zeros((n_fft // 2 + 1, n_mels))
    for m in range(n_mels):
        lo, ce, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, ce):
            if ce > lo:
                fb[k, m] = (k - lo) / (ce - lo)
        for k in range(ce, hi):
            if hi > ce:
                fb[k, m] = (hi - k) / (hi - ce)
    mel = spec @ fb
    return np.log(mel + 1e-6)


def compare(probes_dir: Path) -> int:
    try:
        import torch
        from torchsynth.config import SynthConfig as TSConfig
        from torchsynth.synth import Voice as TSVoice
    except ImportError as e:
        print(f"ERROR: the compare half needs torch + torchsynth installed ({e}).\n"
              "Run `pip install torchsynth` in this environment and retry; the "
              "export half (already committed under tests/golden/torchsynth_probes/)"
              " needs nothing.")
        return 2

    reg = json.loads((probes_dir / "registration.json").read_text())
    specs = reg["specs"]
    failures = 0

    tscfg = TSConfig(
        batch_size=PROBE_BATCH,
        reproducible=False,
        sample_rate=reg["sample_rate"],
        buffer_size_seconds=reg["buffer_size_seconds"],
    )
    voice = TSVoice(tscfg)

    # -- check 1: registration order ------------------------------------------
    ts_keys = list(voice.get_parameters().keys())
    our_keys = [(s["module"], s["name"]) for s in specs]
    if len(ts_keys) != len(our_keys):
        print(f"FAIL registration count: torchsynth {len(ts_keys)} vs ours "
              f"{len(our_keys)}")
        failures += 1
    n_match = sum(1 for a, b in zip(ts_keys, our_keys) if tuple(a) == tuple(b))
    print(f"registration order: {n_match}/{len(our_keys)} keys match exactly")
    if n_match != len(our_keys):
        failures += 1
        for i, (a, b) in enumerate(zip(ts_keys, our_keys)):
            if tuple(a) != tuple(b):
                print(f"  [{i}] torchsynth {a} vs ours {b}")

    # -- check 2: ranges/curves via from_0to1 of the probe values -------------
    for probe in PROBE_SETS:
        d = np.load(probes_dir / f"probe_{probe}.npz")
        params01 = torch.from_numpy(d["params01"])
        for i, (key, param) in enumerate(voice.get_parameters().items()):
            if i >= params01.shape[1]:
                break
            param.data[:] = params01[:, i]
        worst = 0.0
        for i, (key, param) in enumerate(voice.get_parameters().items()):
            if i >= params01.shape[1]:
                break
            ts_nat = param.from_0to1().detach().cpu().numpy()
            ours = d["natural"][:, i]
            scale = max(abs(float(ours.max())), abs(float(ours.min())), 1e-6)
            rel = float(np.abs(ts_nat - ours).max()) / scale
            worst = max(worst, rel)
            if rel > 1e-4:
                print(f"  range/curve mismatch [{probe}] {key}: rel {rel:.2e} "
                      f"(ts {ts_nat[:2]} vs ours {ours[:2]})")
        status = "OK" if worst <= 1e-4 else "FAIL"
        if worst > 1e-4:
            failures += 1
        print(f"ranges/curves [{probe}]: worst rel delta {worst:.2e}  [{status}]")

    # -- check 3: audio, spectrally --------------------------------------------
    for probe in PROBE_SETS:
        d = np.load(probes_dir / f"probe_{probe}.npz")
        params01 = torch.from_numpy(d["params01"])
        for i, (key, param) in enumerate(voice.get_parameters().items()):
            voice.set_parameter_0to1(key, params01[:, i])
        voice.freeze_parameters()
        with torch.no_grad():
            out = voice(None)
        ts_audio = (out[0] if isinstance(out, tuple) else out).detach().cpu().numpy()
        voice.unfreeze_all_parameters()
        ours = d["audio"].astype(np.float32)
        n = min(ts_audio.shape[-1], ours.shape[-1])
        mel_ts = _log_mel(ts_audio[:, :n], reg["sample_rate"])
        mel_us = _log_mel(ours[:, :n], reg["sample_rate"])
        mel_l1 = float(np.mean(np.abs(mel_ts - mel_us)))
        # per-frame RMS envelope distance (tests envelopes/mixing, phase-blind)
        fr = n // 1024 * 1024
        env_ts = np.sqrt((ts_audio[:, :fr].reshape(PROBE_BATCH, -1, 1024) ** 2).mean(-1))
        env_us = np.sqrt((ours[:, :fr].reshape(PROBE_BATCH, -1, 1024) ** 2).mean(-1))
        env_d = float(np.mean(np.abs(env_ts - env_us)))
        status = "OK" if mel_l1 <= 0.5 else "REVIEW"
        print(f"audio [{probe}]: log-mel L1 {mel_l1:.4f} (guideline ≤0.5), "
              f"RMS-envelope MAE {env_d:.4f}  [{status}]")
        if mel_l1 > 0.5:
            failures += 1

    print(f"\n{'PASS' if failures == 0 else 'FAIL'}: {failures} failing checks")
    return 0 if failures == 0 else 1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["export", "compare"])
    ap.add_argument("--out", type=Path, default=PROBES_DIR)
    ap.add_argument("--probes", type=Path, default=PROBES_DIR)
    args = ap.parse_args()
    if args.mode == "export":
        export(args.out)
    else:
        sys.exit(compare(args.probes))


if __name__ == "__main__":
    main()

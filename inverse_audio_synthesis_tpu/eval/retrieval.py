"""Nearest-neighbor retrieval evaluation over freshly synthesized candidates.

Re-implements the reference's notebook loop (reference:
evaluate_audio_representations.py:91-245): embed a fixed set of query sounds once, then
stream candidate batches — synthesize, embed, cdist against the queries, track each
query's best match so far; on improvement, emit the (true, silence, match) audio pair.
The reference's stale APIs (it imports a nonexistent module and calls old constructors,
evaluate_audio_representations.py:43,156,162) are fixed by construction here.

TPU-native: synthesis + embedding + distance + argmin run as ONE jitted chunk step; the
running (best_dist, best_audio) state lives on device and updates via jnp.where, so the
host only sees a scalar "improved" mask per chunk. The reference's
PREDICT_BATCH_SIZE=1024 (evaluate_audio_representations.py:23) is handled by an inner
``lax.scan`` over sub-chunks of ``inner_chunk`` voices — the traced program stays
sub-chunk-sized, so the 1024-candidate config compiles through the remote-compile
limit while still streaming 1024 candidates per host-visible step.
"""

from __future__ import annotations

import signal
from dataclasses import replace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from inverse_audio_synthesis_tpu.synth import SynthConfig
from inverse_audio_synthesis_tpu.synth import modules as synth_modules
from inverse_audio_synthesis_tpu.synth.voice import (
    render_voice_auto,
    sample_voice_params,
)


def cdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance matrix [Na, Nb] (torch.cdist default p=2,
    reference: evaluate_audio_representations.py:211)."""
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    sq = a2 - 2.0 * (a @ b.T) + b2.T
    return jnp.sqrt(jnp.maximum(sq, 0.0))


class RetrievalEvaluator:
    """Tracks per-query nearest neighbors over a candidate stream."""

    def __init__(
        self,
        embed_fn,  # (variables, audio [B, 1, T]) → embeddings [B, D]
        variables,  # model variables — passed as a jit ARGUMENT (closing over them
        #             would bake every parameter into the HLO as literal constants)
        query_synth: SynthConfig,
        candidate_synth: SynthConfig,
        query_batch_num: int = 0,
        inner_chunk: int = 128,
    ):
        self.embed_fn = embed_fn
        self.variables = variables
        self.query_synth = query_synth
        self.candidate_synth = candidate_synth
        bs = candidate_synth.batch_size
        self.inner_chunk = min(inner_chunk, bs)
        assert bs % self.inner_chunk == 0, (bs, self.inner_chunk)
        # sub-chunk synthesis shapes (what the scanned body renders)
        self._sub_synth = replace(
            candidate_synth, batch_size=self.inner_chunk, reproducible=False
        )

        query_params = sample_voice_params(query_batch_num, query_synth)
        self.query_params = query_params
        # auto: fused Pallas kernel on TPU (≈10× the jnp path); both the query and
        # the candidate stream below use the same renderer so distances between
        # params-identical sounds stay exactly comparable
        self.query_audio = render_voice_auto(query_params, query_synth)
        self.query_emb = embed_fn(variables, self.query_audio[:, None, :])
        # fingerprint of the model weights (the query embedding is a function of
        # them) — resuming under different weights silently mixes embedding spaces.
        # Chunking/batch size (which key the candidate noise stream) are validated
        # as separate EXACT-match fields: folding them into this float would drown
        # them in the isclose tolerance at realistic embedding magnitudes.
        self.state_fingerprint = float(
            jnp.sum(jnp.abs(self.query_emb.astype(jnp.float32)))
        )
        n_q = query_synth.batch_size
        self.best_dist = jnp.full((n_q,), jnp.inf, jnp.float32)
        self.best_audio = jnp.zeros((n_q, candidate_synth.buffer_size), jnp.float32)
        # the nearest neighbor's PARAMS: unlike embedding distances (whose scale is
        # checkpoint-specific), the param-space error of the audio-space NN is
        # comparable ACROSS checkpoints/representations — and it is a non-parametric
        # inverse-synthesis baseline (predict a sound's params by NN lookup; the
        # reference's purpose, audio_to_params.py:177-312). Chance floor: an
        # uninformative embedding retrieves a random candidate, E|u−v| = 1/3 per
        # dim for u,v ~ U(0,1).
        self.best_params = jnp.zeros_like(query_params)
        self._chunk = jax.jit(self._chunk_step)

    def _chunk_step(
        self, variables, query_emb, best_dist, best_audio, best_params, batch_num
    ):
        params = sample_voice_params(batch_num, self.candidate_synth)
        k = self.inner_chunk
        n_sub = self.candidate_synth.batch_size // k
        params = params.reshape(n_sub, k, params.shape[-1])
        noise_key = jax.random.PRNGKey(self.candidate_synth.noise_seed)
        query_emb = query_emb.astype(jnp.float32)

        def body(carry, xs):
            best_dist, best_audio, best_params = carry
            sub_params, sub_idx = xs
            # noise rows keyed by GLOBAL row position (sub_idx*k + j) with the same
            # single-level fold_in the fixed-seed render buffer uses (modules.noise):
            # every candidate batch sees identical noise per position — torchsynth's
            # fixed pre-generated noise buffer — so a params-identical candidate at
            # position j reproduces query row j's noise component exactly, and
            # retrieval numbers are comparable across runs/chunkings, without
            # materializing the full [1024, 176400] buffer (722 MB)
            noise = synth_modules.noise(
                noise_key, k, self._sub_synth.buffer_size, row_offset=sub_idx * k
            )
            audio = render_voice_auto(sub_params, self._sub_synth, noise=noise)
            emb = self.embed_fn(variables, audio[:, None, :])
            d = cdist(query_emb, emb.astype(jnp.float32))  # [n_q, k]
            chunk_min = jnp.min(d, axis=1)
            chunk_arg = jnp.argmin(d, axis=1)
            improved = chunk_min < best_dist
            best_dist = jnp.where(improved, chunk_min, best_dist)
            best_audio = jnp.where(improved[:, None], audio[chunk_arg], best_audio)
            best_params = jnp.where(
                improved[:, None], sub_params[chunk_arg], best_params
            )
            return (best_dist, best_audio, best_params), None

        (new_dist, new_audio, new_params), _ = jax.lax.scan(
            body, (best_dist, best_audio, best_params), (params, jnp.arange(n_sub))
        )
        improved = new_dist < best_dist
        return new_dist, new_audio, new_params, improved

    def step(self, batch_num: int) -> np.ndarray:
        """Process one candidate batch; returns the per-query improvement mask."""
        self.best_dist, self.best_audio, self.best_params, improved = self._chunk(
            self.variables,
            self.query_emb,
            self.best_dist,
            self.best_audio,
            self.best_params,
            batch_num,
        )
        # monotone-convergence invariant (reference asserts this:
        # evaluate_audio_representations.py:238-240)
        return np.asarray(improved)

    def planted_query_distance(self) -> np.ndarray:
        """End-to-end eval-correctness probe: render the QUERY params through the
        CANDIDATE pipeline (same renderer, same position-keyed noise rows
        0..n_q−1 — modules.noise keys rows identically for the query synth and a
        candidate sub-chunk at row_offset 0) and measure the distance between the
        stored query embeddings and these planted candidates. The inputs are
        bit-identical by construction, so the distances must be ≈0; anything else
        means the query and candidate paths have drifted apart (wrong noise
        keying, renderer mismatch, embed-path divergence) and every reported NN
        distance is suspect. Cheap (one sub-chunk render+embed); run_retrieval
        executes it at startup and aborts loudly on failure."""
        from dataclasses import replace as _replace

        planted_synth = _replace(self._sub_synth, batch_size=self.query_params.shape[0])
        noise = synth_modules.noise(
            jax.random.PRNGKey(self.candidate_synth.noise_seed),
            self.query_params.shape[0],
            planted_synth.buffer_size,
            row_offset=0,
        )
        audio = render_voice_auto(self.query_params, planted_synth, noise=noise)
        emb = self.embed_fn(self.variables, audio[:, None, :])
        d = cdist(
            self.query_emb.astype(jnp.float32), emb.astype(jnp.float32)
        )  # [n_q, n_q]
        return np.asarray(jnp.diagonal(d)), np.asarray(d)

    def assert_planted_queries_found(self, rtol: float = 0.05) -> None:
        """Self-distances must be far below the inter-query distance scale.

        NOT bit-identity: the stored query embeddings and the planted render
        come from two different XLA programs, and on TPU the bf16 tower matmuls
        round differently per program — measured self-distance ~0.04 against
        inter-sound distances ~8–16 (0.2% of the embedding norm, exactly bf16
        epsilon scale). A real pipeline divergence (wrong noise keying, renderer
        or embed drift) puts the planted candidates at generic inter-sound
        distance, ~20× this gate."""
        diag, d = self.planted_query_distance()
        off = d[~np.eye(d.shape[0], dtype=bool)]
        # median off-diagonal = the typical distance between DIFFERENT sounds;
        # floor it at 1e-6 so a degenerate collapsed-embedding eval still passes
        # its own self-match (everything at one point ⇒ diag is also ~0)
        scale = max(float(np.median(off)), 1e-6)
        if not (diag <= rtol * scale).all():
            raise AssertionError(
                f"planted-query check failed: self-distances {diag} not ≪ the "
                f"inter-query distance scale {scale:.3g} — the query and candidate "
                "pipelines have diverged; retrieval distances are not trustworthy"
            )

    def run(
        self,
        n_batches: int,
        logger=None,
        sample_rate: int = 44100,
        log_every_improvement: bool = True,
        artifact_dir: Optional[str] = None,
        resume: bool = True,
        save_state_every: int = 50,
    ) -> Dict[str, np.ndarray]:
        """Stream ``n_batches`` candidate batches. With ``artifact_dir``, writes the
        per-query min-distance convergence curves as ``convergence.csv`` and (when
        matplotlib is available) ``convergence.png`` — the reference's monotone
        convergence plot (evaluate_audio_representations.py:234-243).

        The reference streams up to 1M candidate batches (:202), so long evals must
        survive preemption: the running (best_dist, best_audio, history) state is
        snapshotted to ``<artifact_dir>/state.npz`` every ``save_state_every`` batches
        and on SIGTERM/SIGINT, and ``resume=True`` (default) picks up from it — the
        candidate stream is a pure function of the batch number, so a resumed run is
        bit-identical to an uninterrupted one."""
        from pathlib import Path

        from inverse_audio_synthesis_tpu.train.loop import PreemptionGuard

        state_file = Path(artifact_dir) / "state.npz" if artifact_dir else None
        history: list = []  # per-chunk min-distance snapshots (the reference's
        # convergence curves, evaluate_audio_representations.py:234-243)
        start = 0
        if resume and state_file is not None and state_file.exists():
            try:
                z = dict(np.load(state_file))
            except Exception as e:
                # e.g. a SIGKILL tore the write: never let a corrupt state file make
                # every supervisor-driven resume crash — start fresh instead
                print(f"retrieval: ignoring {state_file} (unreadable: {e!r})")
                z = None
            same_run = z is not None and (
                z["best_audio"].shape == tuple(self.best_audio.shape)
                and "best_params" in z  # pre-nn_param_mae states lack the NN params
                and np.isclose(
                    float(z.get("fingerprint", np.nan)),
                    self.state_fingerprint,
                    rtol=1e-6,
                )
                and int(z.get("inner_chunk", -1)) == self.inner_chunk
                and int(z.get("candidate_bs", -1)) == self.candidate_synth.batch_size
            )
            if same_run:
                self.best_dist = jnp.asarray(z["best_dist"])
                self.best_audio = jnp.asarray(z["best_audio"])
                self.best_params = jnp.asarray(z["best_params"])
                history = [row.copy() for row in z["history"]]
                start = int(z["batches_done"])
                print(f"retrieval: resuming from {state_file} at batch {start}")
            elif z is not None:
                print(
                    f"retrieval: ignoring {state_file} (different model, shape, or "
                    "chunking)"
                )

        def save_state(batches_done: int) -> None:
            if state_file is None or not history:
                return
            state_file.parent.mkdir(parents=True, exist_ok=True)
            # tmp + atomic rename: a kill mid-write must never tear state.npz
            tmp = state_file.with_name("state.tmp.npz")
            np.savez(
                tmp,
                best_dist=np.asarray(self.best_dist),
                best_audio=np.asarray(self.best_audio),
                best_params=np.asarray(self.best_params),
                history=np.stack(history),
                batches_done=batches_done,
                fingerprint=self.state_fingerprint,
                inner_chunk=self.inner_chunk,
                candidate_bs=self.candidate_synth.batch_size,
            )
            import os

            os.replace(tmp, state_file)

        prev = np.asarray(self.best_dist)
        batches_done = start
        with PreemptionGuard() as guard:
            for i in range(start, n_batches):
                if guard.requested is not None:
                    save_state(i)
                    print(f"retrieval: preempted at batch {i}, state saved")
                    break
                improved = self.step(i + 1)  # batch 0 is the query batch
                cur = np.asarray(self.best_dist)
                assert (cur <= prev + 1e-6).all(), "min distance must be monotone"
                prev = cur
                history.append(cur.copy())
                batches_done = i + 1
                if batches_done % save_state_every == 0:
                    save_state(batches_done)
                if logger is not None and log_every_improvement and improved.any():
                    for q in np.nonzero(improved)[0]:
                        silence = np.zeros(sample_rate // 2, np.float32)
                        clip = np.concatenate(
                            [
                                np.asarray(self.query_audio[q]),
                                silence,
                                np.asarray(self.best_audio[q]),
                            ]
                        )
                        logger.log_audio(
                            f"retrieval/query{q}-dist{cur[q]:.3f}",
                            clip,
                            sample_rate,
                            step=i,
                        )
            else:
                save_state(n_batches)
        history_arr = np.stack(history) if history else np.zeros((0,))
        if artifact_dir is not None and len(history):
            _write_convergence_artifacts(artifact_dir, history_arr)
        if guard.requested == signal.SIGINT and batches_done < n_batches:
            # stopped early by ctrl-C (a SIGINT landing during the final batch
            # doesn't negate a completed run): preserve its semantics
            raise KeyboardInterrupt
        return {
            "best_dist": np.asarray(self.best_dist),
            "best_audio": np.asarray(self.best_audio),
            "best_params": np.asarray(self.best_params),
            "query_params": np.asarray(self.query_params),
            # per-query param-space MAE of the audio-space nearest neighbor —
            # comparable across checkpoints (chance floor 1/3; see __init__)
            "nn_param_mae": np.asarray(
                jnp.mean(jnp.abs(self.best_params - self.query_params), axis=1)
            ),
            "history": history_arr,
            # False when preempted mid-stream — partial results must not be
            # reported as the final metric (callers check this)
            "completed": batches_done >= n_batches,
            "batches_done": batches_done,
        }


def _write_convergence_artifacts(artifact_dir: str, history: np.ndarray) -> None:
    """history [n_batches, n_queries] → convergence.csv (+ .png with matplotlib)."""
    from pathlib import Path

    out = Path(artifact_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_batches, n_q = history.shape
    with open(out / "convergence.csv", "w") as f:
        f.write("batch," + ",".join(f"query{q}" for q in range(n_q)) + "\n")
        for i in range(n_batches):
            f.write(f"{i}," + ",".join(f"{v:.6g}" for v in history[i]) + "\n")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        for q in range(n_q):
            ax.plot(history[:, q], lw=1)
        ax.set_xlabel("candidate batch")
        ax.set_ylabel("min distance")
        ax.set_title("per-query nearest-neighbor convergence")
        fig.tight_layout()
        fig.savefig(out / "convergence.png", dpi=120)
        plt.close(fig)
    except Exception:
        pass  # CSV is the canonical artifact; the plot is best-effort

"""The training loop (replaces Lightning Trainer for this pipeline).

Implements the subset of Trainer behavior the reference relies on
(reference: pretrain.py:91-122, downstream.py:39-63): max_epochs=1 over the batch-number
stream, ``limit_train_batches`` / ``limit_val_batches`` / ``val_check_interval``,
checkpoint cadence + save-last, deterministic seeding, and metric logging.

Anomaly detection (the reference's per-step ``detect_anomaly=True``, pretrain.py:96)
is split TPU-natively: non-finite gradient updates are rejected ON DEVICE at every
step by ``reject_nonfinite_updates`` (train/optim.py) — no poisoned step is ever applied
— and the device-side rejection counter is fetched and raised on at log cadence, so
the steady-state loop still has zero per-step host syncs.
"""

from __future__ import annotations

import math
import signal
import threading
import time
from typing import Any, Dict, Optional

import jax

from inverse_audio_synthesis_tpu.train.checkpoint import CheckpointManager
from inverse_audio_synthesis_tpu.train.optim import total_notfinite
from inverse_audio_synthesis_tpu.train.runsetup import BatchNumberSplit
from inverse_audio_synthesis_tpu.utils.logging import MetricsLogger


class PreemptionGuard:
    """Convert SIGTERM/SIGINT into a cooperative stop flag while training.

    TPU pools preempt with SIGTERM; the reference had no story beyond Lightning's
    default (die mid-step, lose up to checkpoint_every_nbatches of work). Here the
    in-flight jitted step finishes, a checkpoint is written, and ``fit`` returns —
    paired with the CLIs' auto-resume-from-last this makes runs preemption-safe.

    Installs handlers only from the main thread (signal.signal raises elsewhere,
    e.g. under pytest-xdist workers); otherwise stays inert.
    """

    def __init__(self):
        self.requested: Optional[int] = None  # signal number once requested
        self._prev: Dict[int, Any] = {}

    def _handler(self, signum, frame):
        self.requested = signum

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
        return False


class Trainer:
    def __init__(
        self,
        task,
        split: BatchNumberSplit,
        logger: Optional[MetricsLogger] = None,
        checkpoint: Optional[CheckpointManager] = None,
        limit_train_batches: Optional[int] = None,
        limit_val_batches: Optional[int] = None,
        val_check_interval: Optional[int] = None,
        log_every: int = 50,
        detect_anomaly: bool = True,
        steps_per_dispatch: int = 1,
    ):
        self.task = task
        self.split = split
        self.logger = logger
        self.checkpoint = checkpoint
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.val_check_interval = val_check_interval
        self.log_every = log_every
        self.detect_anomaly = detect_anomaly
        # Run up to k train steps as ONE jitted program (task.train_step_multi:
        # lax.scan over host-precomputed batch numbers). At small batch sizes the
        # per-step cost is dominated by the host→device dispatch round trip
        # (measured ~13 ms of the 15 ms b16 step through the TPU tunnel);
        # dispatching k steps at once amortizes it. Dispatches are CLAMPED to the
        # next log/val/checkpoint boundary, so cadence semantics are unchanged —
        # preemption granularity coarsens to ≤ k steps (the guard is polled
        # between dispatches).
        self.steps_per_dispatch = max(1, steps_per_dispatch or 1)
        # set by fit(): the signal number that stopped training early, else None.
        # CLIs use this to skip post-training work and exit non-zero so restart
        # supervisors re-run the job instead of reading a preempted run as success.
        self.interrupted: Optional[int] = None

    def _log(self, metrics: Dict[str, Any], step: int):
        if self.logger is not None:
            self.logger.log(metrics, step=step)

    def validate(self, state, max_batches: Optional[int] = None) -> Dict[str, float]:
        if not hasattr(self.task, "val_step"):
            return {}
        n = min(
            self.split.sizes.val,
            max_batches or self.limit_val_batches or self.split.sizes.val,
        )
        if n == 0:
            return {}
        # accumulate on device; ONE host fetch at the end (a float() per metric per
        # batch costs an RTT each on the tunneled TPU — ~15 s per 128-batch val pass)
        acc: Optional[Dict[str, Any]] = None
        for i in range(n):
            m = self.task.val_step(state, self.split.val_batch_num(i))
            acc = m if acc is None else {k: acc[k] + m[k] for k in m}
        return {k: float(v) / n for k, v in jax.device_get(acc).items()}

    def fit(self, state, start_step: int = 0):
        n_train = self.split.sizes.train
        if self.limit_train_batches:
            n_train = min(n_train, self.limit_train_batches)
        window_start = time.time()
        self.interrupted = None
        # abort on rejections from THIS run only: a checkpoint written after a
        # rejected step carries the cumulative device counter, which must not make
        # every future resume abort on its first step
        self._notfinite_base = float(jax.device_get(total_notfinite(state.opt_state)))
        with PreemptionGuard() as guard:
            state = self._fit_loop(state, start_step, n_train, window_start, guard)
        if self.interrupted == signal.SIGINT:
            raise KeyboardInterrupt  # stopped early by ctrl-C: preserve its semantics
        return state

    def _dispatch_len(self, i: int, n_train: int, start_step: int) -> int:
        """Steps to run in the next dispatch: ≤ steps_per_dispatch, clamped so no
        log/val/checkpoint boundary falls strictly inside the dispatch."""
        stops = [n_train, i + self.steps_per_dispatch]
        if i == start_step:
            stops.append(i + 1)  # the first step always logs
        for m in (
            self.log_every,
            self.val_check_interval,
            self.checkpoint.every_n_steps if self.checkpoint is not None else None,
        ):
            if m:
                stops.append((i // m + 1) * m)  # next multiple of m after i
        return max(1, min(stops) - i)

    def _fit_loop(self, state, start_step: int, n_train: int, window_start, guard):
        multi = self.steps_per_dispatch > 1 and hasattr(self.task, "train_step_multi")
        i = start_step
        while i < n_train:
            if guard.requested is not None:
                # finish-the-step-then-stop: write a resumable checkpoint and log why
                self.interrupted = guard.requested
                if self.checkpoint is not None:
                    self.checkpoint.save(state, i)
                self._log({"preempted_by_signal": float(guard.requested)}, step=i)
                return state
            k = self._dispatch_len(i, n_train, start_step) if multi else 1
            if k > 1:
                nums = [self.split.train_batch_num(j) for j in range(i, i + k)]
                state, stacked = self.task.train_step_multi(state, nums)
                # cadence decisions below look at the LAST step of the dispatch
                metrics = {key: v[-1] for key, v in stacked.items()}
            else:
                state, metrics = self.task.train_step(
                    state, self.split.train_batch_num(i)
                )
            i += k  # i = number of completed steps; boundary step index is i-1

            if i % self.log_every == 0 or i - k == start_step:
                # one host fetch for every metric + the device-side anomaly counter
                fetched = jax.device_get(
                    {**metrics, "notfinite_steps": total_notfinite(state.opt_state)}
                )
                metrics = {key: float(v) for key, v in fetched.items()}
                metrics["notfinite_steps"] -= self._notfinite_base  # this run only
                now = time.time()
                steps = self.log_every if i - k != start_step else k
                metrics["steps_per_sec"] = steps / max(now - window_start, 1e-9)
                metrics["voices_per_sec"] = (
                    metrics["steps_per_sec"] * self.task.synth.batch_size
                )
                window_start = now
                if self.detect_anomaly:
                    bad = {
                        key: v
                        for key, v in metrics.items()
                        if isinstance(v, float) and not math.isfinite(v)
                    }
                    if metrics["notfinite_steps"]:
                        bad["notfinite_steps"] = metrics["notfinite_steps"]
                    if bad:
                        raise FloatingPointError(
                            f"non-finite metrics by step {i - 1}: {bad} (non-finite "
                            f"updates were rejected on device, not applied)"
                        )
                self._log(metrics, step=i - 1)

            if self.val_check_interval and i % self.val_check_interval == 0:
                val_metrics = self.validate(state)
                self._log(val_metrics, step=i - 1)

            if self.checkpoint is not None:
                self.checkpoint.maybe_save(state, i)

        if self.checkpoint is not None:
            self.checkpoint.save(state, n_train)  # save_last
        return state

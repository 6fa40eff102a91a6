"""Orbax checkpointing with the reference's cadence semantics.

Reference behavior: vicreg checkpoints every ``checkpoint_every_nbatches`` steps,
monitored on train loss, plus ``save_last`` (reference: pretrain.py:80-89,
conf/vicreg/full.yaml:16); downstream every 100 steps into ``chkpts/``
(reference: downstream.py:31-37). Consumption: load-from-checkpoint for downstream /
heareval (reference: downstream.py:29, heareval.py:14).

Cadence saves are ASYNC (SURVEY §5.4): orbax's ``save`` blocks only for the
device-to-host copy, then writes to disk in the background while training
continues — safe under the train loop's buffer donation, since the data is already
on host when ``save`` returns. The ``last`` alias is committed (and GC runs) only
after the write finishes, so a crash mid-write can never leave ``last`` pointing at
a torn checkpoint; restores and the final/preemption saves are blocking.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, every_n_steps: int = 10000, keep: int = 3):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.every_n_steps = every_n_steps
        self.keep = keep
        self._ckpt = ocp.StandardCheckpointer()
        self._waiter: Optional[threading.Thread] = None  # finalizes the async save
        self._async_error: Optional[BaseException] = None  # raised at next wait()

    def _step_dir(self, step: int) -> Path:
        return self.dir / f"step_{step:012d}"

    def maybe_save(self, state, step: int, metrics: Optional[dict] = None) -> bool:
        if self.every_n_steps and (step % self.every_n_steps == 0) and step > 0:
            # cadence saves overlap the disk write with training
            self.save(state, step, metrics, blocking=False)
            return True
        return False

    def save(
        self, state, step: int, metrics: Optional[dict] = None, blocking: bool = True
    ) -> Path:
        self.wait()  # at most one write in flight
        path = self._step_dir(step)
        self._ckpt.save(path, state, force=True)  # returns after the D2H copy
        if metrics:
            (path.parent / f"{path.name}.metrics.json").write_text(
                json.dumps({k: float(v) for k, v in metrics.items()})
            )
        if blocking:
            self._ckpt.wait_until_finished()
            self._commit(path)
        else:
            # commit as soon as the background write finishes — NOT lazily at the
            # next save(), which would leave `last` one cadence stale and lose a
            # finalized checkpoint to any hard kill in the interval
            self._waiter = threading.Thread(
                target=self._finalize_async, args=(path,), daemon=False
            )
            self._waiter.start()
        return path

    def wait(self) -> None:
        """Block until any in-flight async save is durable and committed.

        A failure in the background finalize (e.g. disk full during the orbax
        write) is captured and RE-RAISED here — otherwise it would die silently in
        the thread, `last` would never be committed, and a later hard kill would
        silently resume from an older step."""
        if self._waiter is not None:
            self._waiter.join()
            self._waiter = None
        if self._async_error is not None:
            err, self._async_error = self._async_error, None
            raise RuntimeError(
                "async checkpoint save failed; `last` was not committed"
            ) from err

    def _finalize_async(self, path: Path) -> None:
        try:
            self._ckpt.wait_until_finished()
            self._commit(path)
        except BaseException as e:  # surfaced from the next wait()/save()
            self._async_error = e

    def _commit(self, path: Path) -> None:
        # atomic alias update: a kill mid-write must never leave a torn `last`
        tmp = self.dir / "last.tmp"
        tmp.write_text(path.name)
        os.replace(tmp, self.dir / "last")  # save_last semantics
        self._gc()

    def _gc(self):
        steps = sorted(
            s
            for s in self.dir.glob("step_*")
            if s.is_dir() and s.name.split("_")[1].isdigit()  # skip orbax tmp dirs
        )
        for old in steps[: max(0, len(steps) - self.keep)]:
            import shutil

            shutil.rmtree(old, ignore_errors=True)
            m = old.parent / f"{old.name}.metrics.json"
            if m.exists():
                m.unlink()

    def latest_step(self) -> Optional[int]:
        self.wait()
        last = self.dir / "last"
        if last.exists():
            name = last.read_text().strip()
            if (self.dir / name).exists():
                return int(name.split("_")[1])
        # no alias (e.g. a crash before commit, or a concurrent writer's save still
        # in flight): accept only finalized dirs — orbax writes to
        # step_N.orbax-checkpoint-tmp and renames on success, and the tmp name also
        # matches the glob but fails the int() parse
        steps = []
        for d in self.dir.glob("step_*"):
            if d.is_dir():
                try:
                    steps.append(int(d.name.split("_")[1]))
                except ValueError:
                    pass  # in-flight orbax tmp dir
        return max(steps) if steps else None

    def restore(self, target, step: Optional[int] = None):
        """Restore into the structure/shardings of ``target`` (an abstract or concrete
        state pytree)."""
        self.wait()
        step = step if step is not None else self.latest_step()
        assert step is not None, f"no checkpoint found under {self.dir}"
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckpt.restore(self._step_dir(step), abstract)

"""Observability: structured metrics, step timing, profiler traces, NaN guards.

The reference's observability is print-statements with wall-clock deltas
(reference train.py:36-42,146-152, SURVEY.md §5.1/§5.5).  Here:
  * MetricWriter — one interface that both prints reference-compatible lines
    and appends structured JSONL (machine-readable run history);
  * StepTimer — per-interval batch timing identical to the reference's
    Time/Batch(ms) accounting;
  * trace_span — jax.profiler.TraceAnnotation context (XLA trace viewer);
  * enable_nan_debugging — jax_debug_nans toggle (SURVEY.md §5.2).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict


class MetricWriter:
    def __init__(self, path: str = "", also_print: bool = True):
        self.path = path
        self.also_print = also_print
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def write(self, tag: str, step: int, **metrics: Any):
        rec: Dict[str, Any] = {"tag": tag, "step": step,
                               "time": time.time(), **metrics}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
        return rec

    def log_train(self, task: str, epoch: int, batch: int, num_batches: int,
                  ms_per_batch: float, loss: float):
        """Reference-format train line (reference train.py:39-40,149-150)."""
        if self.also_print:
            print(f"**{task}** | Epoch {epoch:2d} | Batch {batch:3d}/"
                  f"{num_batches:3d} | Time/Batch(ms) {ms_per_batch:5.2f} | "
                  f"Train Loss {loss:5.4f}")
        self.write(f"{task.lower()}_train", batch, epoch=epoch,
                   ms_per_batch=ms_per_batch, loss=loss)

    def log_eval(self, epoch: int, hours: float, val_f1: float):
        if self.also_print:
            print("-" * 50)
            print(f"**TRG** | Epoch {epoch:2d} | Time {hours:5.4f} hour | "
                  f"val_wg_av_f1 {val_f1:5.4f} ")
            print("-" * 50)
        self.write("val", epoch, wf1=val_f1, hours=hours)

    def log_test(self, wf1: float):
        if self.also_print:
            print(f"**TEST** | wg_av_f1 {wf1:5.4f} ")
        self.write("test", 0, wf1=wf1)

    def close(self):
        if self._f:
            self._f.close()


class StepTimer:
    """Interval timing with the reference's reset-on-log behavior."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.start = time.time()
        self.total_loss = 0.0
        self.total_size = 0

    def update(self, loss: float, batch_size: int):
        self.total_loss += loss * batch_size
        self.total_size += batch_size

    def interval_stats(self, log_interval: int):
        elapsed = time.time() - self.start
        avg_loss = self.total_loss / max(self.total_size, 1)
        return elapsed * 1000 / max(log_interval, 1), avg_loss


@contextlib.contextmanager
def trace_span(name: str):
    """jax profiler annotation; no-op overhead when no trace is active."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a full device trace for the enclosed region."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Bounded device-trace capture for training loops.

    When constructed with a non-empty `log_dir` (RuntimeConfig.profile_dir /
    `--profile_dir`), the FIRST `steps` calls to step() are captured as a
    jax.profiler trace (viewable in TensorBoard / xprof) and the trace is
    stopped automatically; with an empty log_dir every call is a no-op.
    Skips the very first step so the trace holds steady-state steps, not the
    compile (SURVEY.md §5.1 TPU plan: jax.profiler traces + step timing)."""

    def __init__(self, log_dir: str, steps: int = 5, skip: int = 1):
        self.log_dir = log_dir
        self.steps = steps
        self.skip = skip
        self._seen = 0
        self._active = False

    def step(self):
        if not self.log_dir:
            return
        import jax.profiler

        self._seen += 1
        if self._seen == self.skip + 1 and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and self._seen > self.skip + self.steps:
            jax.profiler.stop_trace()
            self._active = False
            self.log_dir = ""  # one capture per run
            print(f"profiler: {self.steps}-step device trace written")

    def close(self):
        if self._active:
            import jax.profiler

            jax.profiler.stop_trace()
            self._active = False


def enable_nan_debugging():
    import jax

    jax.config.update("jax_debug_nans", True)

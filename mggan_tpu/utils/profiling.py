"""Profiling / tracing hooks (SURVEY.md §5: the reference has none — only
tqdm bars; the TPU build adds jax.profiler traces + step timers)."""

from __future__ import annotations

import contextlib
import time

import jax


def enable_compilation_cache(cache_dir: str) -> None:
    """Persist compiled executables across processes.

    Keyed by HLO + compile options, so a repeat run of the same program
    (a sweep point, evaluate-after-train, a resumed soak) deserializes the
    executable instead of paying the 41-56 s warm compile through the
    remote-compile service. Thresholds are zeroed because every program
    here is dispatch-bound and worth keeping regardless of size.
    """
    import pathlib

    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device sync, reporting steps/sec and
    items/sec over a sliding window."""

    def __init__(self, items_per_step: int = 0):
        self.items_per_step = items_per_step
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        return self

    def tick(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.steps += 1

    def report(self) -> dict:
        dt = time.perf_counter() - self.t0
        out = {"steps_per_sec": self.steps / dt, "wall_s": dt}
        if self.items_per_step:
            out["items_per_sec"] = self.steps * self.items_per_step / dt
        return out


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield

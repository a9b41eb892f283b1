"""Profiling / tracing utilities.

The reference's only instrumentation is a wall-clock print around the demo
forward (``demo.py:24-33``). Here profiling is first-class:

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution.
* ``device_throughput(fn, *args)`` — robust on-device timing: iterates the
  function inside one compiled ``lax.scan`` and synchronizes with
  ``device_get`` (required on remote-tunnel platforms where
  ``block_until_ready`` may not wait and per-dispatch latency dominates).
* ``step_timer()`` — cheap rolling per-step wall-clock statistics for
  training loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """jax.profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_throughput(
    fn: Callable[[jax.Array], jax.Array],
    key: Optional[jax.Array] = None,
    iters: int = 20,
) -> float:
    """Seconds per iteration of ``fn(key) -> array``, measured with an
    on-device scan loop (one dispatch, one synchronization).

    IMPORTANT: make ``fn``'s computation depend on ``key`` (e.g. perturb the
    inputs with it) — XLA hoists loop-invariant work out of the scan, and a
    closure over constant inputs will time only the non-hoistable remainder
    (measured: whole kernels reading back as a fake ~5 ms)."""
    key = key if key is not None else jax.random.PRNGKey(0)

    def run(k):
        def body(c, kk):
            return c + fn(kk).sum(), None

        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(k, iters))
        return acc

    jfn = jax.jit(run)
    # Two warm calls: the first executes a freshly-loaded program, which on
    # this platform carries a one-time ~40 ms load/link cost that a single
    # warm-up did not hide (measured: the first *timed* stage of a process
    # read ~45 ms regardless of content).
    jax.device_get(jfn(key))
    jax.device_get(jfn(jax.random.fold_in(key, 1)))
    t0 = time.perf_counter()
    jax.device_get(jfn(jax.random.fold_in(key, 2)))
    return (time.perf_counter() - t0) / iters


class StepTimer:
    """Rolling wall-clock stats for a training loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._last = time.perf_counter()
        self._samples = []

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._samples.append(dt)
        if len(self._samples) > self.window:
            self._samples.pop(0)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self._samples:
            return {}
        s = sorted(self._samples)
        return {
            "mean_s": sum(s) / len(s),
            "p50_s": s[len(s) // 2],
            "p90_s": s[int(len(s) * 0.9)],
        }

"""Tracing / profiling utilities (SURVEY.md §6.1).

- ``trace(dir)``: context manager around ``jax.profiler.trace`` producing
  TensorBoard/XProf traces.
- ``annotate(name)``: named range (shows up in XProf timelines) for marking
  hash/sort/attend stages.
- ``timed(fn)``: blocking wall-time helper used by the bench harness.
- ``enable_compilation_cache()``: persistent XLA compile cache — first
  compile over the axon tunnel is slow (SURVEY.md env facts), the cache
  makes reruns start in seconds.
- ``enable_nan_debugging()``: the numerical sanitizer posture (§6.2).
"""

from __future__ import annotations

import contextlib
import os
import pathlib
import time
from typing import Callable, Iterator, Optional

import jax


def enable_compilation_cache(directory: Optional[str] = None) -> str:
    d = directory or os.environ.get("RTTS_COMPILE_CACHE",
                                    "/tmp/rtts_jax_cache")
    pathlib.Path(d).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XProf trace viewable in TensorBoard."""
    pathlib.Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace range: with annotate('lsh_sort'): ..."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, repeats: int = 3, warmup: int = 1):
    """Run fn with sync; return (best_seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = fn(*args)
        jax.block_until_ready(jax.tree.leaves(result)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = fn(*args)
        jax.block_until_ready(jax.tree.leaves(result)[0])
        best = min(best, time.perf_counter() - t0)
    return best, result

"""Timing + profiling instrumentation (SURVEY.md §5.1).

The reference times renderC/renderD with std::chrono around cuda_sync
(integrator.cpp:14-27). Equivalents: ``timed`` blocks with
block_until_ready semantics, and a ``trace`` context that wraps
``jax.profiler`` for XLA-level traces viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def timed(label: str, result_holder: dict | None = None, log: bool = True):
    """Wall-clock a block; call ``.block()`` on the yielded handle with the
    output pytree to include device time (the reference's cuda_sync)."""
    t0 = time.perf_counter()

    class Handle:
        elapsed = None

        @staticmethod
        def block(x):
            jax.block_until_ready(x)
            return x

    h = Handle()
    try:
        yield h
    finally:
        h.elapsed = time.perf_counter() - t0
        if result_holder is not None:
            result_holder[label] = h.elapsed
        if log:
            print(f"[psdr_tpu] {label}: {h.elapsed * 1e3:.1f} ms", flush=True)


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (open with TensorBoard or ui.perfetto.dev)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def render_timed(integrator, scene, sensor_id: int = 0, seed: int = 0):
    """renderC with the reference's log_level-gated timing print."""
    holder: dict = {}
    with timed("renderC", holder, log=scene.opts.log_level > 0) as h:
        img = h.block(integrator.renderC(scene, sensor_id, seed))
    return img, holder["renderC"]

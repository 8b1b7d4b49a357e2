"""Timing and profiling.

Replaces StopWatch (core/stop_watch.h:35-74) and the per-stage console
timing prints inside processImage (core/cnn.h:1060-1232), and adds what
the reference never had: real profiler traces (jax.profiler) and
device-synchronised stage timing.
"""

from __future__ import annotations

import contextlib
import time

import jax


def fence(tree) -> None:
    """Hard completion fence for device work feeding ``tree``.

    ``jax.block_until_ready`` alone is NOT a reliable barrier on this
    box: the experimental remote-TPU ("axon") plugin has been observed to
    return from ``block_until_ready`` (and ``effects_barrier``)
    microseconds after dispatching unfinished work, which silently turns
    any throughput measurement into a dispatch-rate measurement (observed
    ~100x inflation).  The only dependable barrier over the tunnel is a
    device->host readback that data-depends on the result, so after
    ``block_until_ready`` this fetches one element per leaf (a few bytes,
    combined into a single transfer).  All benchmark/timing code must
    sync through here, never through ``block_until_ready`` directly.
    """
    import numpy as np

    jax.block_until_ready(tree)
    import jax.numpy as jnp

    probes = []
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim") and getattr(leaf, "size", 0) > 0:
            probes.append(jnp.ravel(leaf)[0].astype(jnp.float32))
    if probes:
        np.asarray(jnp.stack(probes))


class StopWatch:
    """Wall-clock ms timer (core/stop_watch.h semantics: stop() returns the
    elapsed ms and restarts)."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        now = time.perf_counter()
        ms = (now - self._t0) * 1000.0
        self._t0 = now
        return ms


@contextlib.contextmanager
def stage(name: str, *, outputs_fn=None, results: dict | None = None,
          verbose: bool = False):
    """Time a pipeline stage, synced through :func:`fence`.

    ``outputs_fn`` is a REQUIRED keyword-only zero-arg callable returning
    the stage's actual outputs (any pytree); it is called after the block
    and fenced, so the recorded time includes real device completion.
    There is deliberately no fence-free mode: ``jax.effects_barrier``
    returns early on the axon backend and produced silently-wrong stage
    numbers (BASELINE.md measurement-integrity note).
    """
    if outputs_fn is None:
        raise TypeError(
            "stage() requires outputs_fn=<zero-arg callable returning the "
            "stage outputs>: timings must be synced through fence() — "
            "jax.effects_barrier/block_until_ready return early on the "
            "axon backend and produce silently-wrong numbers.")
    t0 = time.perf_counter()
    yield
    fence(outputs_fn())
    ms = (time.perf_counter() - t0) * 1000.0
    if results is not None:
        results[name] = results.get(name, 0.0) + ms
    if verbose:
        print(f"[{name}] {ms:.1f} ms")


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters: int = 20, warmup: int = 2) -> float:
    """Best-of wall time (seconds) of a jitted callable, device-synced."""
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def time_jitted_amortized(fn, *args, reps: int = 100, vary: int = 0,
                          iters: int = 5, warmup: int = 1) -> float:
    """Per-call device time (seconds) of fn, amortised over `reps`
    serialized executions inside ONE dispatch.

    Resolves stage costs far below the per-dispatch latency floor of a
    remote-TPU tunnel (~25 ms on this box), where `time_jitted` can only
    report max(floor, cost).  The scan carry is threaded through argument
    `vary` (must be a float array): each iteration's input depends on the
    previous iteration's output scaled to ~1e-30 (numerically a no-op),
    so XLA can neither CSE the loop body to a single execution nor
    overlap iterations.
    """
    import jax.numpy as jnp

    args = list(args)
    base = jnp.asarray(args[vary])

    @jax.jit
    def run(x0):
        def body(x, _):
            a = list(args)
            a[vary] = x
            out = fn(*a)
            leaf = next(l for l in jax.tree.leaves(out)
                        if hasattr(l, "dtype"))
            eps = jnp.nan_to_num(jnp.mean(leaf).astype(base.dtype),
                                 0.0, 0.0, 0.0) * 1e-30
            return x0 + eps, None
        x, _ = jax.lax.scan(body, x0, None, length=reps)
        return x

    t_total = time_jitted(run, base, iters=iters, warmup=warmup)
    return t_total / reps

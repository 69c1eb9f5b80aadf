"""Device timing that survives high-latency remote backends.

On the axon-tunnel TPU backend, ``block_until_ready`` returns once the
execution is *enqueued*, not completed, and a host readback costs ~35 ms
round-trip. Naive ``block_until_ready`` timing therefore measures enqueue
rate (absurdly fast) or, with a readback per iteration, tunnel latency
(absurdly slow).

``device_time`` uses slope timing: enqueue K1 then K2 iterations, force
completion with ONE tiny readback at the end of each run (device executes
enqueued programs in order, so the last result completing implies all
did), and report (T(K2) - T(K1)) / (K2 - K1). Dispatch overhead and the
readback round-trip cancel in the difference.
"""

from __future__ import annotations

import time
from typing import Any, Callable


def _force(out: Any) -> None:
    """Force completion of a pytree of device arrays via a host readback."""
    import jax
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    if not leaves:
        return
    x = leaves[-1]
    # one element is enough: in-order execution means this completing
    # implies every earlier enqueued program completed
    np.asarray(jax.numpy.ravel(x)[-1])


def _run(fn: Callable, args, k: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    _force(out)
    return time.perf_counter() - t0


def device_time(fn: Callable, *args, k1: int = 5, k2: int = 25, warmup: int = 2) -> float:
    """Seconds per execution of ``fn(*args)`` on device (slope method)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _force(out)
    t1 = _run(fn, args, k1)
    t2 = _run(fn, args, k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def device_time_drain(fn: Callable, *args, k: int = 30, warmup: int = 2) -> float:
    """Steady-state seconds per execution: enqueue k, drain once.

    Dispatch is ~0.04 ms/call on the tunnel backend, so enqueue time is
    negligible. The single end-of-run readback is NOT: its round-trip
    varies with tunnel health (35 ms on a good day, >100 ms observed) and
    inflates every frame by latency/k — enough to mis-rank kernel
    candidates at small k. It is therefore measured directly on the idle
    device (forcing an already-complete output is a pure round-trip) and
    subtracted. Cross-checked against profiler module timelines
    (back-to-back executions, zero gaps); the slope method was observed
    to overestimate by ~30% on this backend for unknown reasons.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _force(out)
    # The round-trip varies sample to sample (tunnel jitter): a single
    # outlier sample would shift every candidate by delta_rb/k, the same
    # order as the effects being ranked. Take the min of several samples
    # (min, not median: readback cannot complete faster than the true
    # round-trip, so the minimum is the least-contaminated estimate).
    rb = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _force(out)  # device idle, result ready: pure readback round-trip
        rb = min(rb, time.perf_counter() - t0)
    total = _run(fn, args, k)
    if rb > 0.5 * total:
        # Readback dominates the run: subtracting would leave noise (or a
        # ~0 value that always wins candidate ranking). Re-measure with a
        # longer run so the work term dominates.
        total = _run(fn, args, 4 * k)
        k = 4 * k
        if rb > 0.5 * total:
            import warnings

            warnings.warn(
                f"device_time_drain: readback ({rb*1e3:.1f} ms) exceeds half "
                f"the {k}-iteration run ({total*1e3:.1f} ms); timing is "
                "latency-dominated and unreliable at this granularity."
            )
    return max((total - rb) / k, 1e-9)


def report(name: str, fn: Callable, *args, **kw) -> float:
    dt = device_time(fn, *args, **kw)
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt

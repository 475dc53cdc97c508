"""Device-honest timing through remote TPU tunnels.

`jax.block_until_ready` can return before device work actually finishes on
remote-tunnel platforms (observed on the axon plugin: every stage of a
30 ms pipeline "timed" at 0.05 ms). The only reliable fence is a host
transfer that data-depends on the outputs. ``time_device`` measures total
wall time for n1 and n2 chained invocations — each batch fenced by ONE
dependent scalar read — and reports the slope, cancelling the fixed RTT:

    t_call = (T(n2) - T(n1)) / (n2 - n1)

The reference times its benchmark with clock() CPU time over a bare loop
(src/benchmark.c:174,210); this is the TPU-native equivalent with compile
time excluded and dispatch latency amortized.
"""

from __future__ import annotations

import time


def fence(out) -> float:
    """Force real completion: one scalar host read depending on ``out``."""
    import jax
    import jax.numpy as jnp

    acc = jnp.float32(0)
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "ravel") and getattr(x, "size", 0):
            acc = acc + x.ravel()[0].astype(jnp.float32)
    return float(jax.device_get(acc))


def time_chained(fn, *args, n1: int = 2, n2: int = 8,
                 repeats: int = 2) -> float:
    """Per-call seconds with every call DATA-DEPENDING on the previous.

    ``fn(x0, *rest)``'s first argument must be an array; each timed call
    perturbs it by a scalar derived from the previous call's outputs, so
    the device must run every call start-to-finish in order — no dedup,
    caching, or cross-call overlap can hide work. Round-5 measurements
    showed the independent-call slope (time_device) over-reporting a
    30 ms pipeline as 44 ms (queueing n identical programs with live
    temporaries inflates per-call cost); chained is both honest and
    tighter. Prefer it for anything > ~2 ms.
    """
    import jax
    import jax.numpy as jnp

    def wrapped(carry, *a):
        x0 = a[0] + (carry * 0).astype(a[0].dtype)
        out = fn(x0, *a[1:])
        c = jnp.float32(0)
        for x in jax.tree_util.tree_leaves(out):
            if hasattr(x, "ravel") and getattr(x, "size", 0):
                c = c + x.ravel()[0].astype(jnp.float32)
        return out, c * jnp.float32(1e-30)

    jw = jax.jit(wrapped)
    out, c = jw(jnp.float32(0), *args)
    float(jax.device_get(c))

    def run(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            out, carry = jw(carry, *args)
        float(jax.device_get(carry))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        best = min(best, (run(n2) - run(n1)) / (n2 - n1))
    return best


def time_device(fn, *args, n1: int = 2, n2: int = 10,
                repeats: int = 2) -> float:
    """Per-call seconds of ``fn(*args)`` on device (slope method)."""
    fence(fn(*args))  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        # One scalar round-trip depending on EVERY call's output: a lazy
        # runtime cannot elide any call, and in-order queues drain fully.
        fence(outs)
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        best = min(best, (run(n2) - run(n1)) / (n2 - n1))
    return best

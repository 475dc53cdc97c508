"""Trustworthy wall-clock timing through the axon TPU tunnel.

On this platform `jax.block_until_ready` can return before the device work
actually finishes (remote placeholder handles), so naive timing loops
under-report by orders of magnitude. The only reliable fence is a small
host transfer (np.asarray of a scalar), but that adds a fixed tunnel RTT.

``time_device`` removes the RTT by measuring total wall time for n1 and n2
chained invocations (each fenced run shares one scalar round-trip) and
reporting the slope:  t = (T(n2) - T(n1)) / (n2 - n1).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out):
    """Force real completion: pull ONE scalar element to the host."""
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0)
    for x in leaves:
        if hasattr(x, "ravel") and x.size:
            acc = acc + x.ravel()[0].astype(jnp.float32)
    return float(jax.device_get(acc))


def _run(fn, args, n):
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    # One scalar round-trip that depends on EVERY call's output, so a lazy
    # runtime cannot elide any of them and in-order queues drain fully.
    _fence(outs)
    return time.perf_counter() - t0


def time_device(fn, *args, n1=2, n2=10, repeats=2):
    """Per-call seconds of ``fn(*args)`` on device, slope method."""
    _fence(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t1 = _run(fn, args, n1)
        t2 = _run(fn, args, n2)
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def report(name, fn, *args, work=None, **kw):
    dt = time_device(fn, *args, **kw)
    extra = f"  {work / dt / 1e6:9.2f} Mrays/s" if work else ""
    print(f"{name:18s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt

"""Trustworthy wall-clock timing on async-dispatch backends.

The axon TPU tunnel executes asynchronously and its `block_until_ready`
returns at RPC-accept, not at device completion — a bandwidth sanity check
(512 MB elementwise copy "finishing" in 0.03 ms, i.e. 17 TB/s on an
819 GB/s part) proves dispatch-only timing.  The only reliable sync is a
device->host read, which itself costs ~0.5-1 s of tunnel latency.

`time_reps` therefore times K back-to-back dispatches (the device queue
serializes them) followed by ONE tiny host read of the last output, and
subtracts the session's measured read latency:

    per_rep = (elapsed - read_latency) / reps

Use enough reps that per-rep compute >> read-latency jitter.  Keep rep
outputs small or reps low: every queued execution holds its output buffer
until it runs (40 queued 512 MB outputs deadlocked the device once).
"""

from __future__ import annotations

import time

import numpy as np
import jax


def sync(out) -> None:
    """Force completion of `out` (any pytree of device arrays) with a
    minimal device->host read."""
    leaf = jax.tree.leaves(out)[0]
    flat = leaf.reshape(-1)[:1]
    np.asarray(flat)


_READ_LAT = None


def read_latency(samples: int = 3) -> float:
    """Measured latency of one tiny host read on this backend (cached)."""
    global _READ_LAT
    if _READ_LAT is None:
        import jax.numpy as jnp
        a = jnp.zeros((4,), jnp.uint32)
        sync(a)
        ts = []
        for _ in range(samples):
            t0 = time.time()
            sync(a)
            ts.append(time.time() - t0)
        _READ_LAT = min(ts)
    return _READ_LAT


def time_reps(fn, *args, reps: int = 3, warm: bool = True) -> float:
    """Average per-call device time of fn(*args): K queued dispatches +
    one forced read, minus the tunnel read latency."""
    lat = read_latency()
    if warm:
        sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return max((time.time() - t0 - lat) / reps, 1e-9)

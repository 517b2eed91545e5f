"""Gather-granularity probe on the local TPU (round-2 design input).

Device-side ragged compaction/staging needs a fast permutation primitive.
Round 1 measured elementwise gathers at ~10 ns/element; this probe measures
how gather cost scales with slice granularity so the compaction design
(VERDICT item 2) can pick the cheapest one:

  g1: word gather            out[i]    = flat[idx[i]]
  g2: 128-word tile gather   out[t, :] = tiles[idx[t], :]
  g3: 65-word window gather  out[w, :] = vmap dynamic_slice(flat, off_w)
  g4: 8-word tile gather     out[t, :] = tiles8[idx[t], :]

Run: python bench/gather_probe.py  (real TPU; ~2 min of compiles)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dctpu.utils.timing import chained_seconds


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.default_rng(0)

    NW = 9_000_000  # ~ compressed words at the 128 MiB bench point
    flat = jnp.asarray(rng.integers(0, 2**32, NW, dtype=np.uint64).astype(np.uint32))
    bytes_moved = NW * 4

    # g1: word gather (monotone-ish src, like a compaction map)
    idx = np.sort(rng.choice(NW, NW // 2, replace=False)).astype(np.int32)
    idx_d = jnp.asarray(idx)

    def g1(flat, idx, salt):
        return flat[idx] ^ salt

    t = chained_seconds(g1, (flat, idx_d), k=3)
    print(f"g1 word gather: {NW//2} words, {t*1e3:.2f} ms, "
          f"{NW//2*4/t/1e9:.2f} GB/s, {t/(NW//2)*1e9:.2f} ns/elem")

    # g2: 128-word tile gather
    T = NW // 128
    tiles = flat[: T * 128].reshape(T, 128)
    tidx = jnp.asarray(np.sort(rng.choice(T, T // 2, replace=False)).astype(np.int32))

    def g2(tiles, tidx, salt):
        return jnp.take(tiles, tidx, axis=0) ^ salt

    t = chained_seconds(g2, (tiles, tidx), k=3)
    moved = (T // 2) * 128 * 4
    print(f"g2 128w tile gather: {T//2} tiles, {t*1e3:.2f} ms, "
          f"{moved/t/1e9:.2f} GB/s, {t/(T//2)*1e9:.1f} ns/tile")

    # g3: 65-word windows at arbitrary word offsets (decode staging shape)
    NWIN = 262_144
    UB1 = 65
    off = jnp.asarray(
        rng.integers(0, NW - UB1, NWIN, dtype=np.int64).astype(np.int32)
    )

    def g3(flat, off, salt):
        def sl(o):
            return jax.lax.dynamic_slice(flat, (o,), (UB1,))

        return jax.vmap(sl)(off) ^ salt

    t = chained_seconds(g3, (flat, off), k=3)
    moved = NWIN * UB1 * 4
    print(f"g3 65w window gather: {NWIN} windows, {t*1e3:.2f} ms, "
          f"{moved/t/1e9:.2f} GB/s, {t/NWIN*1e9:.1f} ns/window")

    # g4: 8-word tile gather (vertical sub-span shape)
    T8 = NW // 8
    tiles8 = flat[: T8 * 8].reshape(T8, 8)
    t8idx = jnp.asarray(
        np.sort(rng.choice(T8, T8 // 2, replace=False)).astype(np.int32)
    )

    def g4(tiles8, t8idx, salt):
        return jnp.take(tiles8, t8idx, axis=0) ^ salt

    t = chained_seconds(g4, (tiles8, t8idx), k=3)
    moved = (T8 // 2) * 8 * 4
    print(f"g4 8w tile gather: {T8//2} tiles, {t*1e3:.2f} ms, "
          f"{moved/t/1e9:.2f} GB/s, {t/(T8//2)*1e9:.1f} ns/tile")

    # reference: plain copy
    def cp(flat, salt):
        return flat ^ salt

    t = chained_seconds(cp, (flat,), k=3)
    print(f"copy: {t*1e3:.2f} ms, {bytes_moved/t/1e9:.2f} GB/s (1R+1W)")


if __name__ == "__main__":
    main()

"""Probe: window-gather tile size for decode staging (round-4 perf work).

tile_window_gather cost = (#windows x ceil(width/tile)+1) tile-row gather
indices (~18 ns each, row width nearly free) + a log2(tile)-pass barrel
realign. Coarser tiles cut the index count for wide windows; this probe
measures the real trade on chip for the two production window shapes:

  vertical decode staging: B*S windows of REGION_PAD=160 words
  rice decode staging:     B*S windows of UB+1 words (UB=64 bucket)

Usage: python bench/probe_tiles.py [B] [L]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from dctpu.kernels import ragged
    from dctpu.utils.timing import chained_seconds

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    S = -(-L // 128)
    rng = np.random.default_rng(0)
    N = 9_000_000  # ~36 MB of disk words, matches bench compressed size
    flat = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    # starts: ascending, arbitrary alignment, like real sub offsets
    starts = np.sort(rng.integers(0, N - 200, size=B * S)).astype(np.int32)
    starts_d = jnp.asarray(starts)
    print(f"windows={B*S}  N={N}  dev={jax.devices()[0]}", flush=True)

    for width, label in ((160, "vertical REGION_PAD"), (65, "rice UB+1")):
        for tile in (16, 32, 64, 128):
            def f(flat, st, salt, tile=tile, width=width):
                return ragged.tile_window_gather(flat ^ salt, st, width, tile)

            t0 = time.time()
            dt = chained_seconds(f, (flat, starts_d), k=4)
            idx = B * S * (-(-width // tile) + 1)
            print(f"{label:22s} tile={tile:4d}  {dt*1e3:7.2f} ms  "
                  f"({idx/1e6:.2f}M indices, {dt/idx*1e9:.1f} ns/idx) "
                  f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()

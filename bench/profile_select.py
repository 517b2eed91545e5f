"""Head-to-head timing of the adaptive selection backends on chip.

Times adaptive_select_body at bench geometry (B=8192, L=4096, 128 MiB)
for each backend:

  auto : select_pallas.adaptive_totals_pallas (r4 production, 94.3 ms)
  bp   : select_bp v3 — bit-plane kernels, in-register delta/dd (xbp)
  xla  : portable formulation (skipped by default: its HLO OOMs the axon
         compile helper at chained k; pass --xla to include)

Verifies bit-identical selections between every timed backend pair before
reporting (a perf number for a wrong kernel is worse than useless — r4
incident). Output: per-backend chained ms + spread.

Usage: python bench/profile_select.py [--b 8192] [--l 4096] [--xla]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dctpu.codec import api as capi
from dctpu.codec.encode import adaptive_select_body
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.utils.timing import chained_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8192)
    ap.add_argument("--l", type=int, default=4096)
    ap.add_argument("--xla", action="store_true")
    args = ap.parse_args()
    B, L = args.b, args.l
    print(f"backend: {jax.default_backend()}  B={B} L={L} "
          f"({B*L*4/2**20:.0f} MiB)", flush=True)

    s, _, _ = synth_corpus(8, B * L // 8, seed=123, mixed_cadence=True,
                           cumulative_frac=0.25)
    x, n, h, _, _ = capi.build_blocks(s, L)
    x, n, h = jnp.asarray(x), jnp.asarray(n), jnp.asarray(h)
    cfg = CodecConfig(block_len=L, coder="adaptive")
    raw = B * L * 4

    sel = jax.jit(adaptive_select_body, static_argnames=("cfg", "backend"))
    backends = ["auto", "bp"] + (["xla"] if args.xla else [])
    outs = {}
    for be in backends:
        t0 = time.time()
        outs[be] = jax.tree.map(np.asarray, sel(x, n, h, cfg, be))
        print(f"[{be}] compile+first: {time.time()-t0:.1f}s", flush=True)
    ref = outs[backends[0]]
    for be in backends[1:]:
        bad = {
            name: int((a != b).sum())
            for name, a, b in zip(("choice", "coder", "k"), outs[be], ref)
        }
        assert not any(bad.values()), (be, bad)
    print("selections bit-identical across backends ✓", flush=True)

    for be in backends:
        def stage(x, n, h, salt, _be=be):
            return adaptive_select_body(
                x ^ salt.astype(jnp.int32), n, h, cfg, _be
            )

        t, sp = chained_stats(stage, (x, n, h), k=3)
        print(f"[{be}] select: {t*1e3:.1f} ms  spread {sp:.3f}  "
              f"({raw/t/1e9:.3f} GB/s if alone)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Per-part timing of the v3 adaptive selection at bench geometry.

Splits the 43.4 ms select (bench_results.json r5) into its parts:

  xbp     : adaptive_totals_xbp — ONE x read covering DELTA + DOUBLE_DELTA
  lpc_z   : one LPC candidate's z materialization (XLA, Q16 wrap-i64)
  bp_tot  : one adaptive_totals_bp call on a materialized z
  lpc_all : all four LPC candidates end-to-end (z + totals each)

Purpose (post-r5 gap #1): decide whether merging two z operands per
pallas_call is worth the r4-incident-class risk. If bp_tot's cost is
~pure compute (scales with candidates, small fixed part), merging calls
saves little and the honest next lever is the spec-level selection rule.

Usage: python bench/profile_select_parts.py [--b 8192] [--l 4096]
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
from dctpu.codec.encode import _cand_z_fn
from dctpu.config import CodecConfig
from dctpu.constants import DELTA, DOUBLE_DELTA
from dctpu.corpus import synth_corpus
from dctpu.kernels.select_bp import adaptive_totals_bp, adaptive_totals_xbp
from dctpu.utils.timing import chained_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8192)
    ap.add_argument("--l", type=int, default=4096)
    args = ap.parse_args()
    B, L = args.b, args.l
    print(f"backend: {jax.default_backend()}  B={B} L={L} "
          f"({B*L*4/2**20:.0f} MiB)", flush=True)

    s, _, _ = synth_corpus(8, B * L // 8, seed=123, mixed_cadence=True,
                           cumulative_frac=0.25)
    x, n, h, _, _ = capi.build_blocks(s, L)
    x, n, h = jnp.asarray(x), jnp.asarray(n), jnp.asarray(h)
    cfg = CodecConfig(block_len=L, coder="adaptive")
    cands = cfg.candidates()
    lpc_idx = [ci for ci, (p, _) in enumerate(cands)
               if p not in (DELTA, DOUBLE_DELTA)]
    print(f"candidates: {len(cands)} total, {len(lpc_idx)} LPC", flush=True)

    def stage_xbp(x, n, h, salt):
        return adaptive_totals_xbp(
            x ^ salt.astype(jnp.int32), h, n, L, cfg.k_max
        )  # (x, history, n, L, k_max) — encode.py call order

    def stage_lpc_z(x, n, h, salt):
        cz = _cand_z_fn(x ^ salt.astype(jnp.int32), h, cands, cfg)
        return cz(lpc_idx[0])

    def stage_bp_tot(x, n, h, salt):
        cz = _cand_z_fn(x ^ salt.astype(jnp.int32), h, cands, cfg)
        return adaptive_totals_bp(cz(lpc_idx[0]), n, L, cfg.k_max)

    def stage_lpc_all(x, n, h, salt):
        cz = _cand_z_fn(x ^ salt.astype(jnp.int32), h, cands, cfg)
        return [adaptive_totals_bp(cz(ci), n, L, cfg.k_max)
                for ci in lpc_idx]

    for name, fn in (("xbp(delta+dd)", stage_xbp),
                     ("lpc_z(1 cand, XLA)", stage_lpc_z),
                     ("lpc_z+bp_tot(1 cand)", stage_bp_tot),
                     ("lpc all %d cands" % len(lpc_idx), stage_lpc_all)):
        t0 = time.time()
        t, sp = chained_stats(fn, (x, n, h), k=3)
        print(f"[{name}] {t*1e3:6.1f} ms  spread {sp:.3f}  "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

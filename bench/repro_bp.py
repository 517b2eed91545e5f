"""Minimal repro driver for the r4 select_bp in-jit miscompile (VERDICT r5 #1).

The incident: select_bp.adaptive_totals_bp is bit-exact standalone (and in
interpret mode) but, when called per-candidate INSIDE the multi-kernel
adaptive-select jit on the axon backend, produced silently wrong totals on
3 of 6 candidates at bench geometry (B=8192, L=4096). optimization_barrier
on the operands did not fix it. This script:

  1. sweeps geometry (B descending from the known-failing 8192) running
     adaptive_select with backend="bp" vs backend="auto" (the select_pallas
     fused kernel — gate-verified on chip) reporting per-output mismatches;
  2. for a failing geometry, compares the IN-JIT per-candidate totals
     against STANDALONE bp calls on materialized candidate z, to separate
     "kernel wrong" from "operands wrong".

"auto" is the reference (not "xla") because the portable formulation's HLO
is large enough to OOM-SIGKILL the axon compile helper at fresh geometries
(SURVEY §11 gap #3) and the fused kernel is equally normative on chip
(smoke gate section 1b diffs it against xla every run).

Usage: python bench/repro_bp.py [--bmax 8192]
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
from dctpu.codec.encode import adaptive_select_body, _cand_z_fn
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus


def _blocks(B, L, seed=123):
    s, _, _ = synth_corpus(8, B * L // 8, seed=seed, mixed_cadence=True,
                           cumulative_frac=0.25)
    x, n, h, _, _ = capi.build_blocks(s, L)
    return jnp.asarray(x), jnp.asarray(n), jnp.asarray(h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bmax", type=int, default=8192)
    ap.add_argument("--l", type=int, default=4096)
    args = ap.parse_args()
    L = args.l
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)

    sel = jax.jit(adaptive_select_body, static_argnames=("cfg", "backend"))
    cfg = CodecConfig(block_len=L, coder="adaptive")

    failed_geo = None
    for B in (args.bmax, args.bmax // 4, args.bmax // 16):
        x, n, h = _blocks(B, L)
        t0 = time.time()
        got = jax.tree.map(np.asarray, sel(x, n, h, cfg, "bp"))
        ref = jax.tree.map(np.asarray, sel(x, n, h, cfg, "auto"))
        bad = {
            name: int((a != b).sum())
            for name, a, b in zip(("choice", "coder", "k"), got, ref)
        }
        status = "MISMATCH" if any(bad.values()) else "ok"
        print(f"[B={B} L={L}] {status} {bad}  ({time.time()-t0:.1f}s)",
              flush=True)
        if any(bad.values()):
            failed_geo = B
            break

    if failed_geo is None:
        print("no mismatch reproduced up to "
              f"B={args.bmax} — try larger geometry or different corpus")
        return 0

    # ---- part 2: in-jit totals vs standalone totals at the failing geometry
    B = failed_geo
    print(f"\n--- localizing at B={B} ---", flush=True)
    x, n, h = _blocks(B, L)
    cands = cfg.candidates()

    from dctpu.kernels.select_bp import adaptive_totals_bp

    def in_jit_totals(x, n, h):
        cand_z = _cand_z_fn(x, h, cands, cfg)
        outs = []
        for ci in range(len(cands)):
            outs.append(adaptive_totals_bp(cand_z(ci), n, L, cfg.k_max))
        return outs

    got = jax.jit(in_jit_totals)(x, n, h)
    got = jax.tree.map(np.asarray, got)

    # standalone: materialize each candidate's z in its own jit, then call
    # the kernel in a jit of its own on the concrete array.
    cand_z_jit = jax.jit(
        lambda x, h, ci: _cand_z_fn(x, h, cands, cfg)(ci),
        static_argnames=("ci",),
    )
    bp_jit = jax.jit(
        lambda z, n: adaptive_totals_bp(z, n, L, cfg.k_max)
    )
    for ci in range(len(cands)):
        z_c = jax.block_until_ready(cand_z_jit(x, h, ci))
        ref_t, ref_v = jax.tree.map(np.asarray, bp_jit(z_c, n))
        bt = int((got[ci][0] != ref_t).sum())
        bv = int((got[ci][1] != ref_v).sum())
        tag = "WRONG-IN-JIT" if bt or bv else "ok"
        print(f"  cand {ci} ({cands[ci]}): {tag} "
              f"totals_mismatch={bt} vwords_mismatch={bv}", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())

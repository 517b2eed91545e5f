"""Minimal repro + variant matrix for the r4 select_bp in-jit miscompile.

repro_bp.py part 2 shrank the incident to: cand_z producer + ONE
adaptive_totals_bp call in a single jit produces wrong totals for the
DOUBLE_DELTA candidate (and 2 of 4 LPC candidates) at B=8192, L=4096,
while the same kernel on the materialized operand is bit-exact. This
script isolates ONE candidate and toggles producer/kernel variants to
find the trigger:

  base      : jit(bp(zigzag(dd_residual(x))))            — expect WRONG
  barrier   : + optimization_barrier on z                 — expect WRONG (r4)
  material  : z materialized in its own jit, bp in another — expect ok
  noderiv   : jit(bp(z)) on a pre-materialized z operand  — producer out
  norev     : reversal [..., ::-1] done by the CALLER in a
              separate jit, kernel fed reversed rows      — splits the
              suspect producer from the kernel call

Usage: python bench/repro_bp_min.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dctpu.codec import api as capi
from dctpu.codec.encode import _cand_z_fn
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.kernels.select_bp import adaptive_totals_bp

B, L = 8192, 4096
CI = 1  # DOUBLE_DELTA — wrong-in-jit per repro_bp.py part 2


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = CodecConfig(block_len=L, coder="adaptive")
    cands = cfg.candidates()
    s, _, _ = synth_corpus(8, B * L // 8, seed=123, mixed_cadence=True,
                           cumulative_frac=0.25)
    x, n, h, _, _ = capi.build_blocks(s, L)
    x, n, h = jnp.asarray(x), jnp.asarray(n), jnp.asarray(h)

    # ground truth: producer in its own jit, kernel in its own jit
    z_c = jax.block_until_ready(jax.jit(
        lambda x, h: _cand_z_fn(x, h, cands, cfg)(CI))(x, h))
    ref_t, ref_v = jax.tree.map(
        np.asarray,
        jax.jit(lambda z, n: adaptive_totals_bp(z, n, L, cfg.k_max))(z_c, n),
    )

    def check(name, fn, *args):
        t0 = time.time()
        t, v = jax.tree.map(np.asarray, jax.jit(fn)(*args))
        bt, bv = int((t != ref_t).sum()), int((v != ref_v).sum())
        tag = "WRONG" if bt or bv else "ok"
        print(f"  {name:10s}: {tag}  totals={bt} vwords={bv}"
              f"  ({time.time()-t0:.1f}s)", flush=True)
        return bt or bv

    def base(x, h, n):
        return adaptive_totals_bp(
            _cand_z_fn(x, h, cands, cfg)(CI), n, L, cfg.k_max)

    def barrier(x, h, n):
        z = jax.lax.optimization_barrier(_cand_z_fn(x, h, cands, cfg)(CI))
        return adaptive_totals_bp(z, n, L, cfg.k_max)

    def noderiv(z, n):
        return adaptive_totals_bp(z, n, L, cfg.k_max)

    check("base", base, x, h, n)
    check("barrier", barrier, x, h, n)
    check("noderiv", noderiv, z_c, n)

    # operands-vs-kernel discriminator: same failing jit, but ALSO return
    # z. If z comes back correct while totals are wrong, the kernel saw
    # different bytes than the jit's own z output (operand corruption at
    # the fusion/layout boundary).
    def basez(x, h, n):
        z = _cand_z_fn(x, h, cands, cfg)(CI)
        t, v = adaptive_totals_bp(z, n, L, cfg.k_max)
        return t, v, z

    t0 = time.time()
    t, v, z_out = jax.tree.map(np.asarray, jax.jit(basez)(x, h, n))
    bt, bv = int((t != ref_t).sum()), int((v != ref_v).sum())
    bz = int((z_out != np.asarray(z_c)).sum())
    print(f"  basez     : totals={bt} vwords={bv} z_mismatch={bz}"
          f"  ({time.time()-t0:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

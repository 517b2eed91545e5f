"""Stage profile of the RICE encode pipeline on the real chip.

encode_blocks[rice] = 6x (residual -> zigzag -> choose_k_planes)   selection
                    + winner-z masked accumulation + codewords     emission
                    + pack (chunked-scan merge packer)             packing

Times each in isolation (numbers over-count fused cost but rank stages), plus
the Pallas packer for comparison with pack_scan.

Usage: python bench/profile_rice.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dctpu.codec import predict, rice
from dctpu.codec.encode import encode_blocks_body
from dctpu.config import CodecConfig
from dctpu.constants import LPC
from dctpu.utils.timing import chained_seconds


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = 4096
    cfg = CodecConfig(coder="rice")
    rng = np.random.default_rng(0)
    from dctpu.corpus import synth_corpus
    from dctpu.codec import api as capi

    streams, _, _ = synth_corpus(8, B * L // 8, seed=123, mixed_cadence=True,
                                 cumulative_frac=0.25)
    x, n, hist, _, _ = capi.build_blocks(streams, L)
    x, n, hist = x[:B], n[:B], hist[:B]
    xd = jax.device_put(jnp.asarray(x))
    nd = jax.device_put(jnp.asarray(n))
    hd = jax.device_put(jnp.asarray(hist))
    raw = x.nbytes
    cands = cfg.candidates()

    def report(name, f, *args):
        t0 = time.time()
        t = chained_seconds(f, args, k=3)
        print(f"{name:42s} {t*1e3:9.2f} ms  {raw/t/1e9:7.3f} GB/s "
              f"(compile+chain {time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        return t

    def cand_z(x, h, ci):
        pred, ti = cands[ci]
        coeffs = cfg.lpc_tables[ti].coeffs if pred == LPC else None
        return rice.zigzag(predict.residuals_for_candidate(x, h, pred, coeffs))

    # NOTE: every stage returns FULL outputs — sliced outputs get dead-code
    # -eliminated by XLA and time as ~0 ms (bench.py docstring, r3).

    # A: one candidate's residual+zigzag alone
    def stage_res(x, nn, h, salt):
        return cand_z(x ^ salt.astype(jnp.int32), h, 0)

    report("A residual+zigzag (1 cand)", stage_res, xd, nd, hd)

    # B: full selection sweep (6x choose_k_planes)
    def stage_sel(x, nn, h, salt):
        xs = x ^ salt.astype(jnp.int32)
        ks, bits = [], []
        for ci in range(len(cands)):
            k_i, b_i = rice.choose_k_planes(cand_z(xs, h, ci), nn, L, cfg.k_max)
            ks.append(k_i)
            bits.append(b_i)
        return jnp.stack(ks), jnp.stack(bits)

    report("B selection sweep (6x choose_k_planes)", stage_sel, xd, nd, hd)

    # B2: the compiled Pallas selection kernel (the TPU default)
    def stage_sel_pallas(x, nn, h, salt):
        xs = x ^ salt.astype(jnp.int32)
        ks, bits = [], []
        for ci in range(len(cands)):
            k_i, b_i = rice.choose_k_auto(
                cand_z(xs, h, ci), nn, L, cfg.k_max, "auto"
            )
            ks.append(k_i)
            bits.append(b_i)
        return jnp.stack(ks), jnp.stack(bits)

    report("B2 selection sweep (Pallas kernel)", stage_sel_pallas, xd, nd, hd)

    # C: winner z + codewords (given a fixed choice)
    choice = jnp.zeros(B, jnp.int32)
    kk = jnp.full(B, 4, jnp.int32)

    def stage_emit(x, nn, h, salt):
        xs = x ^ salt.astype(jnp.int32)
        z = jnp.zeros((B, L), jnp.uint32)
        for ci in range(len(cands)):
            z = jnp.where((choice == ci)[:, None], cand_z(xs, h, ci), z)
        lo, hi, ln = rice.codewords(z, kk[:, None])
        return lo, hi, ln

    report("C winner z + codewords", stage_emit, xd, nd, hd)

    # D: packers, fed fixed codeword arrays
    z0 = cand_z(xd, hd, 0)
    lo, hi, ln = rice.codewords(z0, kk[:, None])
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < nd[:, None]
    lo, hi, ln = jax.device_put(lo), jax.device_put(hi), jax.device_put(ln)

    from dctpu.kernels.pack_scan import pack_scan

    def stage_pack_scan(lo, hi, ln, salt):
        p, bl = pack_scan(lo ^ salt, hi, ln, valid, L)
        return p, bl

    report("D pack_scan (the default)", stage_pack_scan, lo, hi, ln)

    try:
        from dctpu.kernels.attic.pack_pallas import pack_pallas

        def stage_pack_pallas(lo, hi, ln, salt):
            p, bl = pack_pallas(lo ^ salt, hi, ln, valid, L)
            return p, bl

        report("D2 pack_pallas", stage_pack_pallas, lo, hi, ln)
    except Exception as e:
        print(f"pack_pallas failed: {type(e).__name__}: {e}", file=sys.stderr)

    # E: the full fused encode for reference
    def stage_full(x, nn, h, salt):
        e = encode_blocks_body(x ^ salt.astype(jnp.int32), nn, h, cfg, "auto")
        return e.bit_len, e.payload

    report("E full encode_blocks[rice]", stage_full, xd, nd, hd)


if __name__ == "__main__":
    main()

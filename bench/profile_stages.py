"""Stage-level timing of the vertical encode/decode pipeline on the live chip.

Profiles the stages of the REAL (fused, round-2) pipeline:

  E1  per-candidate cost pass: residual -> zigzag -> bitlength sum, x C
  E2  winner z rebuild (masked accumulation over recomputed candidates)
  E3a encode_vertical, XLA exception extraction
  E3b encode_vertical, Pallas exception extraction (TPU default)
  E   full fused encode_blocks (the product path)
  D1a decode_vertical (XLA)      D1b decode_vertical_staged (Pallas)
  D2  unzigzag + predictor reconstruction
  D   full decode_blocks

Each stage is jitted separately so its HBM traffic is isolated (XLA would
otherwise fuse across stage boundaries); numbers therefore OVER-count fused
cost but correctly rank the stages. Timing = forced-fetch (axon platform,
see dctpu.utils.timing). A bytes-moved budget per stage is printed at the
end (BASELINE.md "traffic budget" source).

Usage: python bench/profile_stages.py [B] [L]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.setrecursionlimit(100000)


def main():
    import jax
    import jax.numpy as jnp

    from dctpu.codec import api as capi
    from dctpu.codec import predict, rice
    from dctpu.codec.decode import decode_blocks
    from dctpu.codec.encode import encode_blocks
    from dctpu.config import CodecConfig
    from dctpu.constants import LPC
    from dctpu.corpus import synth_corpus
    from dctpu.kernels.vertical_xla import (
        decode_vertical,
        encode_vertical,
        vertical_selection_cost,
    )
    from dctpu.utils.timing import device_time

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    cfg = CodecConfig(coder="vertical")
    raw = B * L * 4

    streams, _, _ = synth_corpus(8, B * L // 8, seed=123, mixed_cadence=True,
                                 cumulative_frac=0.25)
    x, n, hist, _, _ = capi.build_blocks(streams, L)
    xd = jax.device_put(jnp.asarray(x))
    nd = jax.device_put(jnp.asarray(n))
    hd = jax.device_put(jnp.asarray(hist))
    print(f"B={B} L={L} raw={raw/2**20:.0f} MiB  dev={jax.devices()[0]}",
          flush=True)

    results = {}

    def report(name, f):
        t0 = time.time()
        dt, out = device_time(f, reps=3, warmup=1)
        gbps = raw / dt / 1e9
        results[name] = dt
        print(f"{name:34s} {dt*1e3:8.2f} ms  {gbps:7.2f} GB/s "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
        return out

    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < nd[:, None]
    cands = cfg.candidates()

    def cand_z(x, h, ci):
        pred, ti = cands[ci]
        coeffs = cfg.lpc_tables[ti].coeffs if pred == LPC else None
        return rice.zigzag(predict.residuals_for_candidate(x, h, pred, coeffs))

    # ---- encode stages (fused pipeline shape) ----
    def costs(x, h):
        return jnp.stack([
            vertical_selection_cost(cand_z(x, h, ci), valid)
            for ci in range(len(cands))
        ])
    f_cost = jax.jit(costs)
    cost_c = report("E1 per-candidate cost passes", lambda: f_cost(xd, hd))

    def rebuild(x, h, cost_c):
        choice = jnp.argmin(cost_c, axis=0).astype(jnp.int32)
        z = jnp.zeros((x.shape[0], L), jnp.uint32)
        for ci in range(len(cands)):
            z = jnp.where((choice == ci)[:, None], cand_z(x, h, ci), z)
        return z
    f_reb = jax.jit(rebuild)
    z = report("E2 winner z rebuild", lambda: f_reb(xd, hd, cost_c))

    f_enc_x = jax.jit(lambda z, n: encode_vertical(z, n, L, exc_backend="xla"))
    report("E3a encode_vertical (XLA exc)", lambda: f_enc_x(z, nd))
    f_enc_p = jax.jit(
        lambda z, n: encode_vertical(z, n, L, exc_backend="pallas"))
    report("E3b encode_vertical (Pallas exc)", lambda: f_enc_p(z, nd))

    f_full = jax.jit(
        lambda x, n, h: encode_blocks(x, n, h, cfg, "xla"))
    enc = report("E  full encode_blocks", lambda: f_full(xd, nd, hd))

    # ---- decode stages ----
    from dctpu.codec.vertical_host import compact_vertical, stage_vertical
    from dctpu.kernels.vertical_pallas import decode_vertical_staged

    words, wc = compact_vertical(np.asarray(enc.payload), L)
    off = np.zeros(B + 1, np.int64)
    np.cumsum(wc, out=off[1:])
    pd = jax.device_put(jnp.asarray(stage_vertical(words, off, L)))
    coeffs = jnp.asarray(np.array([t.coeffs for t in cfg.lpc_tables],
                                  dtype=np.int64))

    f_unp = jax.jit(lambda p, n: decode_vertical(p, n, L))
    zd = report("D1a decode_vertical (XLA)", lambda: f_unp(pd, nd))
    f_unp_p = jax.jit(lambda p, n: decode_vertical_staged(p, n, L))
    report("D1b decode_vertical (Pallas)", lambda: f_unp_p(pd, nd))

    def recon(z, pred_, ti, h):
        r = rice.unzigzag(z)
        return predict.reconstruct_all(r, h, pred_, coeffs, ti, True)
    f_rec = jax.jit(recon)
    report("D2 unzigzag+reconstruct_all",
           lambda: f_rec(zd, enc.predictor, enc.table_idx, hd))

    f_dec = jax.jit(lambda p: decode_blocks(
        p, enc.k, nd, enc.predictor, enc.table_idx, hd, coeffs, L, True,
        "xla", "vertical"))
    out = report("D  full decode_blocks", lambda: f_dec(pd))

    ok = np.array_equal(np.asarray(out),
                        x * (np.arange(L)[None, :] < n[:, None]))
    print(f"round-trip bit-exact: {ok}", flush=True)

    # ---- bytes-moved budget (ideal traffic per isolated stage) ----
    C = len(cands)
    S = -(-L // 128)
    region_b = B * (S * 148 + 8) * 4
    budget = [
        ("E1", C * raw + C * raw // L, "C reads of x + C cost tables"),
        ("E2", (2 * C + 1) * raw // 1, "C reads of x + C masked writes + out"),
        ("E3", 2 * raw + region_b, "read z, plane transpose, write regions"),
        ("D1", region_b + raw, "read regions, write z"),
        ("D2", 2 * raw, "read z, write x"),
    ]
    print("\nbytes-moved budget (ideal, per isolated stage):", flush=True)
    for name, byts, what in budget:
        t = results.get(
            {"E1": "E1 per-candidate cost passes",
             "E2": "E2 winner z rebuild",
             "E3": "E3b encode_vertical (Pallas exc)",
             "D1": "D1a decode_vertical (XLA)",
             "D2": "D2 unzigzag+reconstruct_all"}[name])
        eff = byts / t / 1e9 if t else 0.0
        print(f"  {name}: {byts/2**20:7.0f} MiB  ({what}); achieved "
              f"{eff:.0f} GB/s of HBM traffic", flush=True)


if __name__ == "__main__":
    main()

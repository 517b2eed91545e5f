"""Stage-level timing of the vertical encode/decode pipeline on the live chip.

Each stage is jitted separately so its HBM traffic is isolated (XLA would
otherwise fuse across stage boundaries); numbers therefore OVER-count fused
cost but correctly rank the stages. Timing = forced-fetch (axon platform,
see dctpu.utils.timing).

Usage: python bench/profile_stages.py [B] [L]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from dctpu.codec import api as capi
    from dctpu.codec import predict, rice
    from dctpu.codec.decode import decode_blocks
    from dctpu.codec.encode import encode_blocks
    from dctpu.config import CodecConfig
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

    def report(name, f):
        t0 = time.time()
        dt, out = device_time(f, reps=3, warmup=1)
        gbps = raw / dt / 1e9
        print(f"{name:34s} {dt*1e3:8.2f} ms  {gbps:7.2f} GB/s "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
        return out

    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < nd[:, None]

    # ---- encode stages ----
    f_zall = jax.jit(lambda x, h: rice.zigzag(
        predict.all_candidate_residuals(x, h, cfg)))
    z_all = report("E1 residuals+zigzag [C,B,L]", lambda: f_zall(xd, hd))

    def sel(z_all):
        cost_c = vertical_selection_cost(z_all, valid[None])
        choice = jnp.argmin(cost_c, axis=0).astype(jnp.int32)
        return jnp.take_along_axis(z_all, choice[None, :, None], axis=0)[0]
    f_sel = jax.jit(sel)
    z = report("E2 select cost+argmin+take", lambda: f_sel(z_all))

    f_enc = jax.jit(lambda z, n: encode_vertical(z, n, L))
    report("E3 encode_vertical(z)", lambda: f_enc(z, nd))

    f_full = jax.jit(
        lambda x, n, h: encode_blocks(x, n, h, cfg, "xla"))
    enc = report("E  full encode_blocks", lambda: f_full(xd, nd, hd))

    # ---- decode stages ----
    from dctpu.codec.vertical_host import compact_vertical, stage_vertical
    words, wc = compact_vertical(np.asarray(enc.payload), L)
    off = np.zeros(B + 1, np.int64)
    np.cumsum(wc, out=off[1:])
    pd = jax.device_put(jnp.asarray(stage_vertical(words, off, L)))
    coeffs = jnp.asarray(np.array([t.coeffs for t in cfg.lpc_tables],
                                  dtype=np.int64))

    f_unp = jax.jit(lambda p, n: decode_vertical(p, n, L))
    zd = report("D1 decode_vertical -> z", lambda: f_unp(pd, nd))

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


if __name__ == "__main__":
    main()

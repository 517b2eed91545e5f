"""Latency-floor-free device timing of codec stages.

The axon host link costs ~25 ms per device->host fetch, swamping per-stage
times. Method here: run K independent instances of a stage inside ONE jit
(inputs perturbed per instance so CSE cannot collapse them), reduce every
output to a u32 checksum, fetch one scalar. Per-rep time =
(t(K) - t(1)) / (K - 1) cancels both the fetch latency and the dispatch cost.

Usage: python bench/microbench.py [stage ...] [--B N] [--K N]
Stages: enc_full enc_resid enc_select enc_vert dec_full dec_vert dec_recon
        rice_enc rice_dec
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

L = 4096


def checksum(tree):
    import jax.numpy as jnp
    from jax.tree_util import tree_leaves

    acc = jnp.uint32(0)
    for leaf in tree_leaves(tree):
        f = leaf.ravel()
        # cheap order-sensitive fold: sum and sum-of-index-weighted
        s = jnp.sum(f.astype(jnp.uint32)) if f.dtype != jnp.uint32 else jnp.sum(f)
        acc = acc + s
    return acc


def timed_chain(make_stage, xs, K, label):
    """make_stage(x_perturbed) -> pytree; xs is the base input pytree."""
    import jax
    import jax.numpy as jnp

    def chain(k):
        @jax.jit
        def g(*args):
            acc = jnp.uint32(0)
            for i in range(k):
                out = make_stage(*args, salt=jnp.uint32(i))
                acc = acc + checksum(out)
            return acc

        return g

    g1, gK = chain(1), chain(K)
    t0 = time.time()
    np.asarray(g1(*xs))
    np.asarray(gK(*xs))
    compile_s = time.time() - t0

    def run(g):
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(g(*xs))
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    t1, tK = run(g1), run(gK)
    per = (tK - t1) / (K - 1)
    return per, t1, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from dctpu.codec import api as capi
    from dctpu.codec import predict, rice
    from dctpu.codec.decode import decode_blocks_body
    from dctpu.codec.encode import encode_blocks_body
    from dctpu.config import CodecConfig
    from dctpu.corpus import synth_corpus
    from dctpu.kernels.vertical_xla import (
        decode_vertical,
        encode_vertical,
        exceed_counts,
        vertical_selection_cost,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0][2:]: int(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--")}
    B = opts.get("B", 2048)
    K = opts.get("K", 5)
    stages = args or ["enc_full", "dec_full"]
    raw = B * L * 4
    cfg = CodecConfig(coder="vertical")

    streams, _, _ = synth_corpus(8, B * L // 8, seed=123, mixed_cadence=True,
                                 cumulative_frac=0.25)
    x, n, hist, _, _ = capi.build_blocks(streams, L)
    xd = jax.device_put(jnp.asarray(x))
    nd = jax.device_put(jnp.asarray(n))
    hd = jax.device_put(jnp.asarray(hist))
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < jnp.asarray(n)[:, None]
    coeffs = jnp.asarray(np.array([t.coeffs for t in cfg.lpc_tables],
                                  dtype=np.int64))
    print(f"B={B} L={L} raw={raw/2**20:.0f} MiB K={K}", flush=True)

    # precomputed decode inputs (built once on host)
    need_dec = any(s.startswith("dec") for s in stages)
    if need_dec:
        from dctpu.codec.encode import encode_blocks
        from dctpu.codec.vertical_host import compact_vertical, stage_vertical

        enc = encode_blocks(xd, nd, hd, cfg, "xla")
        words, wc = compact_vertical(np.asarray(enc.payload), L)
        off = np.zeros(B + 1, np.int64)
        np.cumsum(wc, out=off[1:])
        pd = jax.device_put(jnp.asarray(stage_vertical(words, off, L)))
        kd, prd, tid = enc.k, enc.predictor, enc.table_idx

    defs = {}
    defs["enc_full"] = (
        lambda x, n, h, salt: encode_blocks_body(x ^ salt.astype(jnp.int32),
                                                 n, h, cfg, "xla"),
        (xd, nd, hd))
    defs["enc_resid"] = (
        lambda x, h, salt: rice.zigzag(predict.all_candidate_residuals(
            x ^ salt.astype(jnp.int32), h, cfg)),
        (xd, hd))

    def _sel(x, h, salt):
        z_all = rice.zigzag(predict.all_candidate_residuals(
            x ^ salt.astype(jnp.int32), h, cfg))
        c = vertical_selection_cost(z_all, valid[None])
        ch = jnp.argmin(c, axis=0).astype(jnp.int32)
        return jnp.take_along_axis(z_all, ch[None, :, None], axis=0)[0]
    defs["enc_select"] = (_sel, (xd, hd))
    defs["enc_vert"] = (
        lambda x, n, salt: encode_vertical(
            rice.zigzag(x ^ salt.astype(jnp.int32)), n, L),
        (xd, nd))
    if need_dec:
        defs["dec_full"] = (
            lambda p, n, h, salt: decode_blocks_body(
                p ^ salt, kd, n, prd, tid, h, coeffs, L, True, "xla",
                "vertical"),
            (pd, nd, hd))
        defs["dec_vert"] = (
            lambda p, n, salt: decode_vertical(p ^ salt, n, L), (pd, nd))

    def _recon(x, h, salt):
        r = rice.unzigzag(rice.zigzag(x ^ salt.astype(jnp.int32)))
        return predict.reconstruct_all(r, h, prd if need_dec else
                                       jnp.zeros(B, jnp.int32),
                                       coeffs,
                                       tid if need_dec else
                                       jnp.zeros(B, jnp.int32), True)
    defs["dec_recon"] = (_recon, (xd, hd))

    # ---- encode_vertical internals (duplicated from vertical_xla) ----
    from dctpu.constants import EXC_CAP, SUB_BLOCK, subs_per_block
    from dctpu.kernels.vertical_xla import (
        _plane_word_counts,
        _select_width,
        _sub_shape,
        bit_transpose32,
    )

    subs = subs_per_block(L)

    def _zs(x, salt):
        z = rice.zigzag(x ^ salt.astype(jnp.int32))
        zs, v = _sub_shape(z, nd, L)
        return zs

    defs["vt_trans"] = (
        lambda x, salt: bit_transpose32(
            _zs(x, salt).reshape(B, subs, 4, 32)),
        (xd,))
    defs["vt_widths"] = (
        lambda x, salt: _select_width(
            exceed_counts(_zs(x, salt)), _plane_word_counts(L)[None, :]),
        (xd,))

    def _exc(x, salt):
        zs = _zs(x, salt)
        valid3 = jnp.ones((B, subs, SUB_BLOCK), bool)
        bitlen = (32 - jax.lax.clz(zs.astype(jnp.int32)).astype(jnp.int32)) * (zs != 0)
        best_b, _, best_exc = _select_width(
            exceed_counts(zs), _plane_word_counts(L)[None, :])
        is_exc = (bitlen > best_b[:, :, None]) & valid3
        rank = jnp.cumsum(is_exc.astype(jnp.int32), axis=2) - 1
        idx = jnp.arange(SUB_BLOCK, dtype=jnp.int32)[None, None, :]
        bb = best_b[:, :, None].astype(jnp.uint32)
        high = jnp.where(bb >= 32, jnp.uint32(0),
                         zs >> jnp.minimum(bb, jnp.uint32(31)))
        pos_list, val_list = [], []
        for j in range(EXC_CAP):
            m = is_exc & (rank == j)
            pos_list.append(jnp.sum(jnp.where(m, idx, 0), axis=2).astype(jnp.uint32))
            val_list.append(jnp.sum(jnp.where(m, high, jnp.uint32(0)), axis=2,
                                    dtype=jnp.uint32))
        return jnp.stack(pos_list, 2), jnp.stack(val_list, 2)

    defs["vt_exc"] = (_exc, (xd,))

    def _dv_trans(p, salt):
        # r4: packed rows — unpack to plane words like decode_vertical does
        from dctpu.kernels.vertical_xla import PLANE_REGION, REGION_PAD, _roll_down_by
        from dctpu.constants import sync_words
        SW = sync_words(L)
        span = (p ^ salt)[:, SW:].reshape(B, subs, REGION_PAD)
        plane_words = span[:, :, :PLANE_REGION].reshape(B, subs, 32, 4)
        return bit_transpose32(jnp.swapaxes(plane_words, 2, 3))
    if need_dec:
        defs["dv_trans"] = (_dv_trans, (pd,))

    def _lpc_only(x, h, salt):
        r = x ^ salt.astype(jnp.int32)
        return predict.reconstruct_lpc(
            r, h, coeffs[jnp.zeros(B, jnp.int32)])
    defs["recon_lpc"] = (_lpc_only, (xd, hd))

    def _dd_only(x, h, salt):
        r = x ^ salt.astype(jnp.int32)
        return predict.reconstruct_double_delta(r, h)
    defs["recon_dd"] = (_dd_only, (xd, hd))

    def _cumsum128(x, salt):
        zs = _zs(x, salt)
        return jnp.cumsum((zs & 1).astype(jnp.int32), axis=2)
    defs["cumsum128"] = (_cumsum128, (xd,))

    def _red16(x, salt):
        zs = _zs(x, salt)
        rank8 = (zs & jnp.uint32(31)).astype(jnp.uint8)  # stand-in rank
        high = zs >> jnp.uint32(3)
        idx = jnp.arange(SUB_BLOCK, dtype=jnp.int32)[None, None, :]
        outs = []
        for j in range(EXC_CAP):
            m = rank8 == jnp.uint8(j)
            outs.append(jnp.sum(jnp.where(m, idx, 0), axis=2))
            outs.append(jnp.sum(jnp.where(m, high, jnp.uint32(0)), axis=2,
                                dtype=jnp.uint32))
        return tuple(outs)
    defs["red16"] = (_red16, (xd,))

    def _gather16(x, salt):
        zs = _zs(x, salt)
        # fake positions: any in-range indices
        pos = (jnp.arange(16, dtype=jnp.int32)[None, None, :] * 7 + salt.astype(jnp.int32)) % 128
        pos = jnp.broadcast_to(pos, (B, subs, 16))
        return jnp.take_along_axis(zs, pos, axis=2)
    defs["gather16"] = (_gather16, (xd,))

    rcfg = CodecConfig(coder="rice")
    defs["rice_enc"] = (
        lambda x, n, h, salt: encode_blocks_body(x ^ salt.astype(jnp.int32),
                                                 n, h, rcfg, "xla"),
        (xd, nd, hd))

    for s in stages:
        fn, base = defs[s]
        per, t1, cs = timed_chain(fn, base, K, s)
        print(f"{s:12s} {per*1e3:9.3f} ms/rep  {raw/per/1e9:8.2f} GB/s   "
              f"(t1={t1*1e3:.1f} ms, compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

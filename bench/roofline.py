"""Roofline table for the codec pipelines (round-3 VERDICT missing #2).

For every pipeline stage: honest chained-timing ms (full outputs checksummed,
no DCE — bench.py measurement-honesty rule), the stage's ideal HBM traffic in
bytes, the implied memory-bound time at the MEASURED achievable bandwidth
(stage 'hbm_copy' calibrates it on the same chip, same timing method), and
the fraction of that bound the stage achieves. Writes bench/roofline.json —
the committed artifact behind BASELINE.md's roofline section.

A stage at fraction ~1.0 is memory-bound ("done" in the speed-of-light
sense); a stage far below 1.0 is compute- or gather-bound and is where
optimization effort goes.

Usage: python bench/roofline.py [B] [L]   (defaults 8192 4096 = 128 MiB)
"""

import json
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
    from dctpu.codec.decode import decode_blocks_body
    from dctpu.codec.encode import encode_blocks_body
    from dctpu.config import CodecConfig
    from dctpu.constants import LPC, sub_caps, subs_per_block, sync_words
    from dctpu.corpus import synth_corpus
    from dctpu.format.frame import payload_word_counts
    from dctpu.kernels import ragged
    from dctpu.kernels.vertical_xla import (
        REGION_PAD,
        decode_vertical,
        encode_vertical,
        vertical_selection_cost,
    )
    from dctpu.utils.timing import chained_seconds

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    raw = B * L * 4
    S = subs_per_block(L)
    SW = sync_words(L)

    streams, _, _ = synth_corpus(
        16, B * L // 16, seed=123, mixed_cadence=True, cumulative_frac=0.25
    )
    x, n, hist, _, _ = capi.build_blocks(streams, L)
    xd = jax.device_put(jnp.asarray(x))
    nd = jax.device_put(jnp.asarray(n))
    hd = jax.device_put(jnp.asarray(hist))
    print(f"B={B} L={L} raw={raw/2**20:.0f} MiB  dev={jax.devices()[0]}",
          flush=True)

    cfg = CodecConfig(coder="vertical")
    cfg_r = CodecConfig(coder="rice")
    cands = cfg.candidates()
    C = len(cands)

    rows = {}

    def stage(name, fn, args, traffic_bytes, what, chain=4):
        """Time fn(*args, salt) chained; record vs the traffic bound."""
        t0 = time.time()
        dt = chained_seconds(fn, args, k=chain)
        rows[name] = {
            "ms": dt * 1e3,
            "input_gbps": raw / dt / 1e9,
            "traffic_bytes": int(traffic_bytes),
            "traffic_gbps": traffic_bytes / dt / 1e9,
            "what": what,
        }
        print(f"{name:26s} {dt*1e3:8.2f} ms  {raw/dt/1e9:6.2f} GB/s(in)  "
              f"{traffic_bytes/dt/1e9:6.1f} GB/s(traffic)  "
              f"[{time.time()-t0:.0f}s]", flush=True)
        return dt

    # ---- 0. achievable-bandwidth calibration: pure read+write pass ----
    def copy_stage(x, salt):
        return x ^ salt.astype(jnp.int32)

    stage("hbm_copy", copy_stage, (xd,), 2 * raw, "read x + write x")
    bw = rows["hbm_copy"]["traffic_gbps"]

    # ---- vertical encode stages ----
    def cand_z(x, h, ci):
        pred, ti = cands[ci]
        coeffs = cfg.lpc_tables[ti].coeffs if pred == LPC else None
        return rice.zigzag(predict.residuals_for_candidate(x, h, pred, coeffs))

    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < nd[:, None]

    def cost_stage(x, h, salt):
        xs = x ^ salt.astype(jnp.int32)
        return jnp.stack([
            vertical_selection_cost(cand_z(xs, h, ci), valid)
            for ci in range(C)
        ])

    stage("v_cost_sweep", cost_stage, (xd, hd),
          C * raw, f"{C} candidate reads of x (ideal: 1 if fused)")

    cost_c = jax.jit(lambda x, h: cost_stage(x, h, jnp.uint32(0)))(xd, hd)
    choice0 = jnp.argmin(cost_c, axis=0).astype(jnp.int32)

    def rebuild_stage(x, h, choice, salt):
        xs = x ^ salt.astype(jnp.int32)
        z = jnp.zeros((B, L), jnp.uint32)
        for ci in range(C):
            z = jnp.where((choice == ci)[:, None], cand_z(xs, h, ci), z)
        return z

    stage("v_winner_rebuild", rebuild_stage, (xd, hd, choice0),
          2 * raw, "read x, write z (ideal; masked chain may re-read)")

    z0 = jax.jit(
        lambda x, h, c: rebuild_stage(x, h, c, jnp.uint32(0))
    )(xd, hd, choice0)
    region_b = B * (SW + S * REGION_PAD) * 4  # packed rows (r4 layout)

    def emit_stage(z, n, salt):
        return encode_vertical(z ^ salt, n, L, exc_backend="mega")

    stage("v_emit(encode_vertical)", emit_stage, (z0, nd),
          raw + region_b, "read z, write regions")

    def enc_full(x, n, h, salt):
        e = encode_blocks_body(x ^ salt.astype(jnp.int32), n, h, cfg, "auto")
        return e.bit_len, e.payload

    # r5: the mega emit keeps the chained HLO small — chain normally
    # (the r4 fused XLA encode chain OOM-killed the compile helper)
    t_enc = stage("v_encode_full", enc_full, (xd, nd, hd),
                  2 * raw + region_b, "read x, select, write regions")

    # ---- vertical compaction ----
    enc = jax.jit(
        encode_blocks_body, static_argnames=("cfg", "backend")
    )(xd, nd, hd, cfg, "auto")
    bl = np.asarray(enc.bit_len)
    wc = SW + bl.astype(np.int64) // 32
    comp_b = int(wc.sum()) * 4
    SWT = -(-SW // ragged.VERT_TILE)
    ub = B * SWT + B * S + -(-int(bl.sum()) // 32 // ragged.VERT_TILE)
    total_tiles = min(
        ragged.tile_bucket(ub),
        B * (SWT + S * (ragged.REGION_PAD // ragged.VERT_TILE)),
    )

    def compact_stage(p, salt):
        return ragged.compact_vertical_semi(p ^ salt, L, total_tiles)

    t_cmp = stage("v_compact_semi", compact_stage, (enc.payload,),
                  region_b + 2 * comp_b,
                  "read regions, repack, write ~comp bytes")

    # ---- vertical decode staging + kernels ----
    words = capi.compact_enc_payload_device(enc.payload, bl, L, "vertical")
    off = np.zeros(B + 1, np.int64)
    np.cumsum(wc, out=off[1:])
    flat_d = jnp.asarray(words)
    off_d = jnp.asarray(off.astype(np.int32))

    # staging sub-stage: the per-sub window gather alone
    sync0 = ragged.vertical_sync_entries_device(flat_d, off_d, L)
    pw_h = np.array([(c + 31) // 32 for c in sub_caps(L)], np.int32)
    wc_sub0 = ragged.vertical_wc_sub(sync0, jnp.asarray(pw_h))
    suboff0 = jnp.cumsum(wc_sub0, axis=1) - wc_sub0
    starts0 = (off_d[:-1, None] + SW + suboff0).reshape(-1)

    def gather_stage(flat, starts, salt):
        return ragged.tile_window_gather(
            flat ^ salt, starts, REGION_PAD, ragged.STAGE_GATHER_TILE)

    stage("v_stage_gather_only", gather_stage, (flat_d, starts0),
          comp_b + B * S * ragged.REGION_PAD * 4,
          "read comp words (windowed), write padded spans")

    from dctpu.codec.vertical_host import _parse_sync_rows

    sync_rows = words[off[:-1, None] + np.arange(SW)[None, :]]
    bw_h, _, _ = _parse_sync_rows(sync_rows, S)
    span_w = ragged.span_bucket(int(bw_h.max()) if bw_h.size else 0)

    def dstage_stage(flat, o, salt):
        return ragged.stage_vertical_device(flat ^ salt, o, L, span_w)

    t_stg = stage("v_stage_full", dstage_stage, (flat_d, off_d),
                  comp_b + region_b,
                  f"read comp words (span={span_w}), write packed rows")

    padded = jax.jit(
        ragged.stage_vertical_device,
        static_argnames=("block_len", "span_words"),
    )(flat_d, off_d, L, span_w)

    from dctpu.kernels.vdec_pallas import decode_vertical_mega

    def dkern_stage(p, salt):
        return decode_vertical_mega(p ^ salt, nd, L)

    t_dk = stage("v_decode_kernel", dkern_stage, (padded,),
                 region_b + raw, "read regions, write z")

    coeffs = jnp.asarray(
        np.array([t.coeffs for t in cfg.lpc_tables], dtype=np.int64))

    def recon_stage(z, salt):
        r = rice.unzigzag(z ^ salt)
        return predict.reconstruct_all(
            r, hd, enc.predictor, coeffs, enc.table_idx, True)

    stage("v_reconstruct", recon_stage, (z0,), 2 * raw, "read z, write x")

    def dfull_stage(p, salt):
        return decode_blocks_body(
            p ^ salt, enc.k, nd, enc.predictor, enc.table_idx, hd, coeffs,
            L, True, "auto", "vertical", 32, 0)

    stage("v_decode_full", dfull_stage, (padded,),
          region_b + raw, "read regions, write x")

    # ---- rice stages ----
    def rsel_stage(x, h, salt):
        xs = x ^ salt.astype(jnp.int32)
        ks, bits = [], []
        for ci in range(C):
            k_i, b_i = rice.choose_k_auto(cand_z(xs, h, ci), nd, L, cfg.k_max)
            ks.append(k_i)
            bits.append(b_i)
        return jnp.stack(ks), jnp.stack(bits)

    stage("r_select_sweep", rsel_stage, (xd, hd),
          C * raw, f"{C} candidate reads of x")

    enc_r = jax.jit(
        encode_blocks_body, static_argnames=("cfg", "backend")
    )(xd, nd, hd, cfg_r, "auto")
    bl_r = np.asarray(enc_r.bit_len)
    W_r = enc_r.payload.shape[1]
    pay_b = B * W_r * 4

    from dctpu.kernels import api as kapi

    def remit_stage(z, k, salt):
        lo, hi, ln = rice.codewords(z ^ salt, k[:, None])
        return kapi.pack(lo, hi, ln, valid, L, "auto")

    stage("r_emit(codewords+pack)", remit_stage, (z0, enc_r.k),
          raw + pay_b, "read z, write padded payload")

    def renc_full(x, n, h, salt):
        e = encode_blocks_body(x ^ salt.astype(jnp.int32), n, h, cfg_r, "auto")
        return e.bit_len, e.payload

    stage("r_encode_full", renc_full, (xd, nd, hd),
          2 * raw + pay_b, "read x, select, write payload", chain=3)

    from dctpu.kernels.unpack_scan import (
        buf_bucket, max_sub_bits_host, unpack_scan)

    words_r = capi.compact_enc_payload_device(enc_r.payload, bl_r, L, "rice")
    wc_r = payload_word_counts(bl_r, L)
    off_r = np.zeros(B + 1, np.int64)
    np.cumsum(wc_r, out=off_r[1:])
    comp_rb = int(wc_r.sum()) * 4
    flat_r = jnp.asarray(words_r)
    offd_r = jnp.asarray(off_r.astype(np.int32))
    dec_buf = buf_bucket(max_sub_bits_host(words_r, off_r, L))
    staged_b = B * (SW + S * (dec_buf + 1)) * 4

    def rstage_stage(flat, o, salt):
        return ragged.stage_rice_scan_device(flat ^ salt, o, L, dec_buf)

    stage("r_stage_scan", rstage_stage, (flat_r, offd_r),
          comp_rb + staged_b, f"read comp, write [B,SW+S*{dec_buf+1}] rows")

    staged_r = jax.jit(
        ragged.stage_rice_scan_device, static_argnames=("block_len", "buf_words")
    )(flat_r, offd_r, L, dec_buf)

    def runp_stage(p, salt):
        return unpack_scan(p ^ salt, enc_r.k, nd, L, dec_buf)

    stage("r_unpack_scan", runp_stage, (staged_r,),
          staged_b + raw,
          f"read staged rows, {128}-step shift scan, write z", chain=3)

    # ---- emit table ----
    print(f"\ncalibrated achievable BW: {bw:.0f} GB/s "
          f"(hbm_copy, chained timing)", flush=True)
    print(f"{'stage':26s} {'ms':>8s} {'bound ms':>9s} {'frac':>6s}  notes",
          flush=True)
    for name, r in rows.items():
        bound_ms = r["traffic_bytes"] / (bw * 1e9) * 1e3
        r["bound_ms_at_measured_bw"] = bound_ms
        r["frac_of_bound"] = bound_ms / r["ms"] if r["ms"] else 0.0
        print(f"{name:26s} {r['ms']:8.2f} {bound_ms:9.2f} "
              f"{r['frac_of_bound']:6.2f}  {r['what']}", flush=True)

    out = {
        "B": B, "L": L, "raw_bytes": raw,
        "achievable_bw_gbps": bw,
        "comp_bytes_vertical": comp_b,
        "comp_bytes_rice": comp_rb,
        "stages": rows,
    }
    with open("bench/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote bench/roofline.json", flush=True)


if __name__ == "__main__":
    main()

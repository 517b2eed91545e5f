"""Micro-profile of compact_vertical_semi (r5: the vertical-enc bottleneck).

bench_results r5: vertical enc pipeline 52.4 ms = mega emit ~20 ms +
compaction ~32 ms, vs a 1.3 ms compaction traffic bound (roofline
v_compact frac 0.037). Splits the compaction into: sync parse + wc math,
the forward-fill segment map, and the live-tile gather itself, plus the
gather at alternative tile widths to re-measure the per-index cost on
this geometry.

Usage: python bench/profile_compact.py [B] [L]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from dctpu.codec import api as capi
    from dctpu.codec.encode import encode_blocks_body
    from dctpu.config import CodecConfig
    from dctpu.constants import subs_per_block, sync_words
    from dctpu.corpus import synth_corpus
    from dctpu.kernels import ragged
    from dctpu.utils.timing import chained_seconds

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    S = subs_per_block(L)
    SW = sync_words(L)

    streams, _, _ = synth_corpus(16, B * L // 16, seed=123,
                                 mixed_cadence=True, cumulative_frac=0.25)
    x, n, hist, _, _ = capi.build_blocks(streams, L)
    cfg = CodecConfig(block_len=L, coder="vertical")
    enc = jax.jit(
        encode_blocks_body, static_argnames=("cfg", "backend")
    )(jnp.asarray(x), jnp.asarray(n), jnp.asarray(hist), cfg, "auto")
    rows = jax.block_until_ready(enc.payload)
    bl = np.asarray(enc.bit_len)

    SWT = -(-SW // ragged.VERT_TILE)
    RPT = ragged.REGION_PAD // ragged.VERT_TILE
    ub = (B * SWT + B * S
          + -(-int(bl.astype(np.int64).sum()) // 32 // ragged.VERT_TILE))
    total_tiles = min(ragged.tile_bucket(ub), B * (SWT + S * RPT))
    print(f"B={B} L={L} total_tiles={total_tiles} "
          f"({total_tiles*ragged.VERT_TILE*4/1e6:.1f} MB semi)", flush=True)

    def report(name, fn, args, chain=3):
        dt = chained_seconds(fn, args, k=chain)
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    def full(rows, salt):
        out, wc = ragged.compact_vertical_semi(
            rows ^ salt, L, total_tiles)
        return out, wc

    report("compact_vertical_semi FULL", full, (rows,))

    def parse_only(rows, salt):
        rows = rows ^ salt
        sync = rows[:, :SW]
        entries = ragged._sync_u16(sync, S)
        _, pws = ragged._pw_groups(L)
        wc_sub = ragged.vertical_wc_sub(entries, jnp.asarray(pws))
        return wc_sub

    report("sync parse + wc", parse_only, (rows,))

    # segment map + gather on a fixed (parsed once) geometry
    sync = rows[:, :SW]
    entries = ragged._sync_u16(sync, S)
    _, pws = ragged._pw_groups(L)
    wc_sub = jax.block_until_ready(
        ragged.vertical_wc_sub(entries, jnp.asarray(pws)))
    tc_sub = (wc_sub + ragged.VERT_TILE - 1) // ragged.VERT_TILE
    tc = jnp.concatenate(
        [jnp.full((B, 1), SWT, jnp.int32),
         tc_sub.astype(jnp.int32)], axis=1).reshape(-1)
    stride = SWT + S * RPT
    within = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         SWT + jnp.arange(S, dtype=jnp.int32) * RPT])
    src_start = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * stride + within[None, :]
    ).reshape(-1)
    tc = jax.block_until_ready(tc)

    def ffill_only(tc, salt):
        tcs = tc ^ (salt & 0)  # salt defeats CSE; value unchanged
        off = ragged.exclusive_scan(tcs)
        return ragged._ffill_at(off[:-1], src_start - off[:-1], total_tiles)

    report("ffill segment map", ffill_only, (tc,))

    ff = jax.block_until_ready(jax.jit(
        lambda tc: ragged._ffill_at(
            ragged.exclusive_scan(tc)[:-1],
            src_start - ragged.exclusive_scan(tc)[:-1], total_tiles)
    )(tc))

    def gather_only(rows, ff, salt):
        src_tiles = (rows ^ salt).reshape(-1, ragged.VERT_TILE)
        i = jnp.arange(total_tiles, dtype=jnp.int32)
        src = jnp.clip(ff + i, 0, src_tiles.shape[0] - 1)
        return src_tiles[src]

    report("live-tile gather (tile=16)", gather_only, (rows, ff))

    # same gather at coarser source rows: pair the tile indices. Source
    # rows of 32/64 words need index = src//2 (//4) plus a parity select;
    # approximate the cost with aligned reads at those widths.
    for width in (32, 64):
        W = rows.shape[1]
        Wp = -(-W // width) * width
        rp = jnp.pad(rows, ((0, 0), (0, Wp - W)))
        T2 = B * (Wp // width)
        n_idx = total_tiles * ragged.VERT_TILE // width

        def gather_w(rp, ff, salt, width=width, T2=T2, n_idx=n_idx):
            src_rows = (rp ^ salt).reshape(T2, width)
            i = jnp.arange(n_idx, dtype=jnp.int32)
            src = jnp.clip(
                ff[: n_idx] // (width // ragged.VERT_TILE) + i, 0, T2 - 1
            )
            return src_rows[src]

        report(f"aligned row gather width={width} "
               f"({n_idx} idx)", gather_w, (rp, ff))


if __name__ == "__main__":
    raise SystemExit(main())

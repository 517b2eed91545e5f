"""Isolate where compact_vertical_semi spends its time on the real chip.

Round-2 VERDICT weak #4: vertical enc_kernel 5.83 GB/s but enc_pipeline
0.0505 GB/s — the semi-compaction costs ~100x the encode kernel. This
breaks the jitted compaction into its stages at bench geometry so the fix
targets the real bottleneck instead of a guess:

  A  sync parse + wc tables                  (cheap control math)
  B  plane repack (stride-4 -> live prefix)  ([B,S,128] selects)
  C  tail roll + concat                      ([B,S,152] barrel shifts)
  D  tile_segment_compact                    (ffill + 5M-row tile gather)
  F  full compact_vertical_semi              (everything fused)

Every stage returns FULL outputs (sliced outputs would be DCE'd and time
as ~0 ms — bench.py docstring, r3).

Usage: python bench/profile_compact.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dctpu.constants import subs_per_block, sync_words
from dctpu.kernels import ragged
from dctpu.kernels.vertical_xla import PLANE_REGION, REGION_WORDS
from dctpu.utils.timing import chained_seconds


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = 4096
    S = subs_per_block(L)
    SW = sync_words(L)
    W = SW + S * REGION_WORDS
    rng = np.random.default_rng(0)

    # synthetic but plausible rows: b in [2, 14], n_exc in [0, 4]
    b = rng.integers(2, 15, size=(B, S)).astype(np.uint32)
    n_exc = rng.integers(0, 5, size=(B, S)).astype(np.uint32)
    e = rng.integers(1, 20, size=(B, S)).astype(np.uint32)
    entries = b | (n_exc << 6) | (((e - 1) & 0x1F) << 11)
    sync = (entries[:, 0::2] | (entries[:, 1::2] << 16)).astype(np.uint32)
    region = rng.integers(0, 2**32, size=(B, S * REGION_WORDS), dtype=np.uint64).astype(np.uint32)
    rows = np.concatenate([sync, region], axis=1)
    rows_d = jax.device_put(jnp.asarray(rows))
    print(f"B={B} rows {rows.nbytes/1e6:.0f} MB", file=sys.stderr)

    SWT = -(-SW // ragged.VERT_TILE)
    RPT = ragged.REGION_PAD // ragged.VERT_TILE
    total_tiles = B * (SWT + S * RPT)

    def report(name, f, *args):
        t0 = time.time()
        t = chained_seconds(f, args, k=3)
        print(f"{name:40s} {t*1e3:9.2f} ms   (compile+chain {time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        return t

    # ---- A: sync parse + wc ----
    def stage_a(rows, salt):
        sync = rows[:, :SW] ^ salt
        entries = ragged._sync_u16(sync, S)
        pw_d = jnp.asarray(ragged._pw_groups(L)[1])
        wc_sub = ragged.vertical_wc_sub(entries, pw_d)
        return wc_sub

    report("A sync parse + wc", stage_a, rows_d)

    # ---- B: plane repack ----
    groups, pws = ragged._pw_groups(L)

    def stage_b(rows, salt):
        region = (rows[:, SW:] ^ salt).reshape(B, S, REGION_WORDS)
        planes = region[:, :, :PLANE_REGION]
        packed = jnp.zeros_like(planes)
        for pwv, subs_list in groups.items():
            mask = np.zeros(S, bool)
            mask[subs_list] = True
            m = jnp.asarray(mask)[None, :, None]
            packed = jnp.where(m, ragged._plane_pack(planes, pwv), packed)
        return packed

    report("B plane repack", stage_b, rows_d)

    # ---- C: tail roll ----
    def stage_c(rows, salt):
        sync = rows[:, :SW]
        entries = ragged._sync_u16(sync, S)
        bq, n_excq, _ = ragged.vertical_parse_sync(entries)
        bq = bq.astype(jnp.int32)
        region = (rows[:, SW:] ^ salt).reshape(B, S, REGION_WORDS)
        tail = region[:, :, PLANE_REGION:]
        posw = ((n_excq + 3) // 4)[:, :, None]
        vals_down = ragged._roll_down_by(tail, 4 - posw, 1)
        tail = jnp.pad(tail, ((0, 0), (0, 0), (0, ragged.REGION_PAD - 20)))
        rolled = jnp.zeros_like(tail)
        for pwv, subs_list in groups.items():
            mask = np.zeros(S, bool)
            mask[subs_list] = True
            m = jnp.asarray(mask)[None, :, None]
            rolled = jnp.where(m, ragged._roll_up_by(tail, bq[:, :, None], pwv), rolled)
        return rolled, vals_down

    report("C tail roll", stage_c, rows_d)

    # ---- D: tile_segment_compact alone ----
    pw_h = np.asarray(pws)
    entries_h = np.stack(
        [rows[:, :SW].view(np.uint32) & 0xFFFF,
         rows[:, :SW] >> 16], axis=2
    ).reshape(B, -1)[:, :S].astype(np.int64)
    bh = entries_h & 0x3F
    neh = (entries_h >> 6) & 0x1F
    eh = np.where(neh > 0, ((entries_h >> 11) & 0x1F) + 1, 0)
    vwh = np.where(neh > 0, np.minimum(neh, (eh + 1) // 2), 0)
    wc_sub_h = pw_h[None, :] * bh + (neh + 3) // 4 + vwh
    tc_sub = -(-wc_sub_h // ragged.VERT_TILE)
    tc_h = np.concatenate(
        [np.full((B, 1), SWT, np.int64), tc_sub], axis=1
    ).reshape(-1).astype(np.int32)
    stride = SWT + S * RPT
    within = np.concatenate([[0], SWT + np.arange(S) * RPT])
    src_start_h = (
        np.arange(B)[:, None] * stride + within[None, :]
    ).reshape(-1).astype(np.int32)
    src_tiles_d = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(B * stride, ragged.VERT_TILE),
                                 dtype=np.uint64).astype(np.uint32)))
    tc_d = jax.device_put(jnp.asarray(tc_h))
    ss_d = jax.device_put(jnp.asarray(src_start_h))
    live_tiles = int(tc_h.sum())
    print(f"segments {tc_h.size}  live tiles {live_tiles} "
          f"({live_tiles*ragged.VERT_TILE*4/1e6:.0f} MB) of {total_tiles}",
          file=sys.stderr)

    def stage_d(tiles, tc, ss, salt):
        return ragged.tile_segment_compact(tiles ^ salt, ss, tc, total_tiles)

    report("D tile_segment_compact (full cap)", stage_d, src_tiles_d, tc_d, ss_d)

    # D2: compact only to the live prefix size (rounded up)
    live_cap = -(-live_tiles // 65536) * 65536

    def stage_d2(tiles, tc, ss, salt):
        return ragged.tile_segment_compact(tiles ^ salt, ss, tc, live_cap)

    report(f"D2 tile_segment_compact (cap={live_cap})", stage_d2,
           src_tiles_d, tc_d, ss_d)

    # ---- F: the full fused compaction ----
    def stage_f(rows, salt):
        return ragged.compact_vertical_semi(rows ^ salt, L, total_tiles)

    report("F full compact_vertical_semi", stage_f, rows_d)


if __name__ == "__main__":
    main()

"""Localize the rice-vs-vertical compact fetch asymmetry (VERDICT r5 #5).

bench_results r4: rice relay fetch 19.9 s for 34 MB vs vertical 1.2 s for
32 MB through the same relay. compact_enc_payload_device's host tail is
the same shape for both (device semi stream -> host slice -> np.asarray
-> squeeze), so this probe times each step separately:

  compact   jitted semi-compaction, block_until_ready
  slice     device slice semi_d[:n] (a tiny jit of its own), block
  fetch     np.asarray of the slice (host transfer)
  squeeze   ragged.squeeze_host

Usage: python bench/probe_fetch.py [B] [L]
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
    from dctpu.corpus import synth_corpus
    from dctpu.format.frame import payload_word_counts
    from dctpu.kernels import ragged

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    streams, _, _ = synth_corpus(16, B * L // 16, seed=123,
                                 mixed_cadence=True, cumulative_frac=0.25)
    x, n, hist, _, _ = capi.build_blocks(streams, L)
    xd, nd, hd = jnp.asarray(x), jnp.asarray(n), jnp.asarray(hist)

    for coder in ("rice", "vertical"):
        cfg = CodecConfig(block_len=L, coder=coder)
        enc = jax.jit(
            encode_blocks_body, static_argnames=("cfg", "backend")
        )(xd, nd, hd, cfg, "auto")
        bl = np.asarray(enc.bit_len)
        print(f"[{coder}]", flush=True)

        for rep in range(2):
            t0 = time.time()
            if coder == "vertical":
                from dctpu.constants import subs_per_block, sync_words

                S = subs_per_block(L)
                SW = sync_words(L)
                SWT = -(-SW // ragged.VERT_TILE)
                RPT = ragged.REGION_PAD // ragged.VERT_TILE
                body_words = int(bl.astype(np.int64).sum()) // 32
                ub = B * SWT + B * S + -(-body_words // ragged.VERT_TILE)
                total_tiles = min(ragged.tile_bucket(ub),
                                  B * (SWT + S * RPT))
                semi_d, wc_sub_d = ragged.compact_vertical_semi(
                    enc.payload, L, total_tiles
                )
                jax.block_until_ready(semi_d)
                t1 = time.time()
                wc_sub = np.asarray(wc_sub_d[:B]).astype(np.int64)
                lens = np.concatenate(
                    [np.full((B, 1), SW, np.int64), wc_sub], axis=1
                ).reshape(-1)
                tc = -(-lens // ragged.VERT_TILE)
                src_off = np.zeros(lens.size + 1, np.int64)
                np.cumsum(tc * ragged.VERT_TILE, out=src_off[1:])
                nwords = int(src_off[-1])
                t2 = time.time()
                sl = semi_d[:nwords]
                jax.block_until_ready(sl)
                t3 = time.time()
                semi = np.asarray(sl)
                t4 = time.time()
                out = ragged.squeeze_host(semi, src_off[:-1], lens)
                t5 = time.time()
            else:
                wc = payload_word_counts(bl, L)
                tc_h = (-(-wc // ragged.RICE_TILE)).astype(np.int64)
                total_tiles = min(
                    ragged.tile_bucket(int(tc_h.sum())),
                    B * (-(-enc.payload.shape[1] // ragged.RICE_TILE)),
                )
                semi_d = ragged.compact_rice_semi(
                    enc.payload, jnp.asarray(tc_h.astype(np.int32)),
                    total_tiles,
                )
                jax.block_until_ready(semi_d)
                t1 = t2 = time.time()
                nwords = int(tc_h.sum()) * ragged.RICE_TILE
                sl = semi_d[:nwords]
                jax.block_until_ready(sl)
                t3 = time.time()
                semi = np.asarray(sl)
                t4 = time.time()
                src_off = np.zeros(B, np.int64)
                np.cumsum(tc_h[:B - 1] * ragged.RICE_TILE,
                          out=src_off[1:])
                out = ragged.squeeze_host(semi, src_off, wc)
                t5 = time.time()
            print(
                f"  rep{rep}: compact {t1-t0:6.2f}s  meta {t2-t1:5.2f}s  "
                f"slice {t3-t2:6.2f}s  fetch {t4-t3:6.2f}s "
                f"({semi.nbytes/1e6:.1f} MB, "
                f"{semi.nbytes/max(t4-t3,1e-9)/1e6:6.1f} MB/s)  "
                f"squeeze {t5-t4:5.2f}s  out {out.nbytes/1e6:.1f} MB",
                flush=True,
            )


if __name__ == "__main__":
    raise SystemExit(main())

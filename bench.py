"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: device encode throughput, GB/s per chip (the BASELINE.json metric is
"encode/decode GB/s per chip"). vs_baseline compares against the per-chip
share of the driver target (>= 10 GB/s aggregate on a v5p-16 = 8 chips ->
1.25 GB/s per chip). Detail lines (decode GB/s, ratio, host-pipeline numbers)
go to stderr.

Runs on whatever backend is ambient (the real TPU under the driver; CPU if
JAX_PLATFORMS=cpu).
"""

import json
import sys
import time

import numpy as np

BASELINE_PER_CHIP_GBPS = 10.0 / 8.0  # v5p-16 aggregate target / 8 chips


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from dctpu.codec import api as capi
    from dctpu.codec.decode import decode_blocks
    from dctpu.codec.encode import encode_blocks
    from dctpu.config import CodecConfig
    from dctpu.corpus import synth_corpus
    from dctpu.format import write_frame
    from dctpu.kernels.pack_xla import padded_words

    dev = jax.devices()[0]
    log(f"device: {dev}")
    cfg = CodecConfig()
    L = cfg.block_len

    # Exactly one chunk geometry: 2048 blocks x 4096 samples = 32 MiB input.
    B = 2048
    n_streams = 16
    per_stream = B * L // n_streams
    streams, ids, cads = synth_corpus(n_streams, per_stream, seed=123,
                                      mixed_cadence=True, cumulative_frac=0.25)
    raw_bytes = sum(s.nbytes for s in streams)

    x, n, hist, _, _ = capi.build_blocks(streams, L)
    xd = jax.device_put(jnp.asarray(x))
    nd = jax.device_put(jnp.asarray(n))
    hd = jax.device_put(jnp.asarray(hist))

    # ---- encode: compile + steady-state device step ----
    t0 = time.time()
    enc = jax.block_until_ready(encode_blocks(xd, nd, hd, cfg, "xla"))
    log(f"encode compile+first: {time.time()-t0:.1f}s")
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        enc = jax.block_until_ready(encode_blocks(xd, nd, hd, cfg, "xla"))
    enc_gbps = raw_bytes * reps / (time.time() - t0) / 1e9
    log(f"device encode: {enc_gbps:.4f} GB/s/chip")

    # ---- decode ----
    bit_len = np.asarray(enc.bit_len)
    from dctpu.format.frame import payload_word_counts
    compact = capi.compact_payload(np.asarray(enc.payload), bit_len, L)
    wc = payload_word_counts(bit_len, L)
    word_off = np.zeros(wc.size + 1, dtype=np.int64)
    np.cumsum(wc, out=word_off[1:])
    padded = capi.pad_payload(compact, word_off, B, padded_words(L) + 2)
    coeffs = np.array([t.coeffs for t in cfg.lpc_tables], dtype=np.int64)
    pd = jax.device_put(jnp.asarray(padded))
    args = (
        pd, enc.k, nd, enc.predictor, enc.table_idx, hd,
        jax.device_put(jnp.asarray(coeffs)),
    )
    t0 = time.time()
    out = jax.block_until_ready(decode_blocks(*args, L, True, "xla"))
    log(f"decode compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(decode_blocks(*args, L, True, "xla"))
    dec_gbps = raw_bytes * reps / (time.time() - t0) / 1e9
    log(f"device decode: {dec_gbps:.4f} GB/s/chip")

    ok = np.array_equal(
        np.asarray(out), x * (np.arange(L)[None, :] < n[:, None])
    )
    log(f"round-trip bit-exact: {ok}")

    frame = capi.compress(streams, cfg, stream_ids=ids, cadences=cads)
    comp_bytes = len(write_frame(frame))
    log(f"compression ratio: {raw_bytes/comp_bytes:.3f}x "
        f"({raw_bytes} -> {comp_bytes} bytes)")

    if not ok:
        log("FATAL: round trip failed; reporting 0")
        enc_gbps = 0.0

    print(json.dumps({
        "metric": "encode_gbps_per_chip",
        "value": round(enc_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(enc_gbps / BASELINE_PER_CHIP_GBPS, 4),
    }))


if __name__ == "__main__":
    main()

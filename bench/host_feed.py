"""Host-feed throughput at config-5 scale (round-3 VERDICT missing #3).

BASELINE.json config 5 is "10M streams sharded over N hosts"; BASELINE.md
named host-side input feeding the residual scaling risk. This measures the
per-host feed rate in streams/sec for 1M small streams:

  build_loop   round-3 per-stream Python loop (reference; forced)
  build_flat   vectorized build_blocks_flat (one concat + chunked gather)
  meta+frame   StreamDir construction + write_frame + read_frame directory
  split_loop   per-stream list split of decoded blocks (round-3 decompress)
  split_flat   decompress_flat-style masked flatten

Writes bench/host_feed.json. Pure host work — runs anywhere.

Usage: python bench/host_feed.py [n_streams] [mean_len] [block_len]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from dctpu.codec import api as capi
    from dctpu.format.frame import StreamDir

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    rng = np.random.default_rng(11)
    lens = rng.integers(1, 2 * mean_len, size=N).astype(np.int64)
    total = int(lens.sum())
    flat = rng.integers(-(2**15), 2**15, size=total, dtype=np.int32)
    print(f"N={N} streams, {total} samples ({total*4/2**20:.0f} MiB), L={L}",
          flush=True)
    res = {"n_streams": N, "total_samples": total, "block_len": L}

    # stream list (the public API input shape) — build it outside timing
    sstart = np.zeros(N + 1, np.int64)
    np.cumsum(lens, out=sstart[1:])
    streams = [flat[sstart[i]: sstart[i + 1]] for i in range(N)]

    def timeit(name, f, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            out = f()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        res[name + "_s"] = best
        res[name + "_streams_per_s"] = N / best
        print(f"{name:12s} {best:8.2f} s  {N/best:12.0f} streams/s",
              flush=True)
        return out

    # round-3 reference: the per-stream loop (forced)
    old = capi._FLAT_PATH_MIN_STREAMS
    try:
        capi._FLAT_PATH_MIN_STREAMS = 10**18
        timeit("build_loop", lambda: capi.build_blocks(streams, L), reps=1)
    finally:
        capi._FLAT_PATH_MIN_STREAMS = old

    # r4 vectorized paths
    x, n, hist, nb, first = timeit(
        "build_flat", lambda: capi.build_blocks_flat(flat, lens, L))
    timeit("build_list_dispatch", lambda: capi.build_blocks(streams, L))

    def metas():
        return capi._stream_metas(streams, None, None, nb, first)

    sd = timeit("stream_dir", metas)
    assert isinstance(sd, StreamDir)

    # frame directory serialize/parse at this stream count (no payload)
    from dctpu.format.frame import STREAM_DIR_DTYPE

    def dir_roundtrip():
        rec = sd.to_records()
        b = rec.tobytes()
        return StreamDir.from_records(
            np.frombuffer(b, dtype=STREAM_DIR_DTYPE))

    timeit("dir_serde", dir_roundtrip)

    # decode-side split: per-stream list vs flat
    def split_loop():
        out = []
        for i in range(N):
            fb, k = int(first[i]), int(nb[i])
            s = x[fb: fb + k].reshape(-1)[: int(lens[i])]
            out.append(s)
        return out

    timeit("split_loop", split_loop, reps=1)

    def split_flat():
        mask = np.arange(L, dtype=np.int64)[None, :] < n[:, None]
        return x.reshape(-1)[mask.reshape(-1)]

    got = timeit("split_flat", split_flat)
    assert np.array_equal(got, flat)

    res["speedup_build"] = res["build_loop_s"] / res["build_flat_s"]
    res["speedup_split"] = res["split_loop_s"] / res["split_flat_s"]
    print(f"build speedup {res['speedup_build']:.1f}x, "
          f"split speedup {res['speedup_split']:.1f}x", flush=True)
    with open("bench/host_feed.json", "w") as f:
        json.dump(res, f, indent=1)
    print("wrote bench/host_feed.json", flush=True)


if __name__ == "__main__":
    main()

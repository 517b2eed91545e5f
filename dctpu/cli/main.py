"""dcomp — encode / decode / verify / bench CLI (SURVEY.md §1 L0).

Capability-equivalent to the reference C codec's CLI (file-in/file-out
compress + decompress with selectable predictors; reference unavailable, see
SURVEY.md §0): reads DCR1 raw corpus containers (or bare little-endian int32
files), writes DCF1 frames.

  python -m dctpu.cli.main encode in.dcr out.dcf [--block-len N] [--predictors delta,dd,lpc]
  python -m dctpu.cli.main decode in.dcf out.dcr
  python -m dctpu.cli.main verify in.dcr [--sharded]
  python -m dctpu.cli.main bench  [--streams N] [--samples N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _load_streams(path: str):
    from dctpu.format import read_raw

    data = Path(path).read_bytes()
    if data[:4] == b"DCR1":
        return read_raw(data)
    # bare int32 file = single stream
    return [np.frombuffer(data, dtype="<i4").copy()], [0], [900]


def _cfg(args, streams=None):
    from dctpu.config import CodecConfig
    from dctpu.constants import DELTA, DOUBLE_DELTA, LPC

    names = {"delta": DELTA, "dd": DOUBLE_DELTA, "lpc": LPC}
    preds = tuple(names[p] for p in args.predictors.split(","))
    tables = None
    if getattr(args, "fit_tables", False) and streams is not None:
        from dctpu.codec.select import fit_lpc_tables

        tables = fit_lpc_tables(streams)
    kw = {} if tables is None else {"lpc_tables": tables}
    return CodecConfig(
        block_len=args.block_len, predictors=preds, coder=args.coder, **kw
    )


def cmd_encode(args):
    from dctpu.codec import compress
    from dctpu.dist import compress_sharded
    from dctpu.format import write_frame

    streams, ids, cads = _load_streams(args.input)
    raw = sum(s.nbytes for s in streams)
    t0 = time.time()
    cfg = _cfg(args, streams)
    if args.sharded:
        frame = compress_sharded(streams, cfg, stream_ids=ids, cadences=cads)
    else:
        frame = compress(streams, cfg, stream_ids=ids, cadences=cads)
    data = write_frame(frame)
    dt = time.time() - t0
    Path(args.output).write_bytes(data)
    print(
        f"encoded {len(streams)} streams: {raw} -> {len(data)} bytes "
        f"({raw/len(data):.3f}x) in {dt:.2f}s ({raw/dt/1e9:.3f} GB/s)",
        file=sys.stderr,
    )


def cmd_decode(args):
    from dctpu.codec import decompress
    from dctpu.dist import decompress_sharded
    from dctpu.format import read_frame, write_raw

    frame = read_frame(Path(args.input).read_bytes())
    t0 = time.time()
    if args.sharded:
        streams = decompress_sharded(frame)
    else:
        streams = decompress(frame)
    dt = time.time() - t0
    ids = [s.stream_id for s in frame.streams]
    cads = [s.cadence_s for s in frame.streams]
    Path(args.output).write_bytes(write_raw(streams, ids, cads))
    raw = sum(s.nbytes for s in streams)
    print(f"decoded {raw} bytes in {dt:.2f}s ({raw/dt/1e9:.3f} GB/s)", file=sys.stderr)


def cmd_verify(args):
    from dctpu.codec import compress, decompress
    from dctpu.dist import compress_sharded, decompress_sharded
    from dctpu.format import read_frame, write_frame

    streams, ids, cads = _load_streams(args.input)
    cfg = _cfg(args, streams)
    if args.sharded:
        frame = compress_sharded(streams, cfg, stream_ids=ids, cadences=cads)
        out = decompress_sharded(read_frame(write_frame(frame)))
    else:
        frame = compress(streams, cfg, stream_ids=ids, cadences=cads)
        out = decompress(read_frame(write_frame(frame)))
    ok = all(np.array_equal(a, b) for a, b in zip(streams, out))
    raw = sum(s.nbytes for s in streams)
    comp = len(write_frame(frame))
    print(f"verify: {'OK' if ok else 'MISMATCH'}  ratio={raw/comp:.3f}x", file=sys.stderr)
    return 0 if ok else 1


def cmd_bench(args):
    import bench

    bench.main()
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="dcomp", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, io=True):
        if io:
            sp.add_argument("input")
        sp.add_argument("--block-len", type=int, default=4096)
        sp.add_argument("--predictors", default="delta,dd,lpc")
        sp.add_argument("--coder", default="adaptive",
                        choices=["rice", "vertical", "adaptive"],
                        help="rice = classic Rice frames, vertical = max "
                        "throughput, adaptive = per-block best of both "
                        "(FORMAT §4.1, default)")
        sp.add_argument("--fit-tables", action="store_true",
                        help="replace the built-in LPC tables with "
                             "corpus-fit OLS->Q16 tables (serialized into "
                             "the frame; decoders need no side channel)")
        sp.add_argument("--sharded", action="store_true",
                        help="shard over all local devices")

    sp = sub.add_parser("encode", help="DCR1/raw int32 -> DCF1")
    common(sp)
    sp.add_argument("output")
    sp.set_defaults(fn=cmd_encode)

    sp = sub.add_parser("decode", help="DCF1 -> DCR1")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--sharded", action="store_true")
    sp.set_defaults(fn=cmd_decode)

    sp = sub.add_parser("verify", help="round-trip self check")
    common(sp)
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("bench", help="run the benchmark harness")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    rc = args.fn(args)
    return rc or 0


if __name__ == "__main__":
    sys.exit(main())

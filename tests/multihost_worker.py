"""Worker for simulated multi-host tests: 2 local processes over localhost TCP.

Usage: python tests/multihost_worker.py <coordinator> <nproc> <pid> <outfile>
Each process encodes its half of the seed-pinned corpus; process 0 writes the
assembled frame bytes to <outfile>.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coord, nproc, pid, outfile = sys.argv[1:5]
    parts_dir = sys.argv[5] if len(sys.argv) > 5 else None
    from dctpu.dist import multihost

    multihost.initialize(coord, int(nproc), int(pid))

    from dctpu.config import CodecConfig
    from dctpu.corpus import synth_corpus
    from dctpu.format import write_frame

    n_streams = 6 if int(nproc) == 2 else 8  # divisible split per proc count
    streams, ids, cads = synth_corpus(n_streams, 2000, seed=77,
                                      mixed_cadence=True, cumulative_frac=0.4)
    # contiguous split across processes
    per = len(streams) // int(nproc)
    lo, hi = int(pid) * per, (int(pid) + 1) * per
    frame, stats = multihost.compress_multihost(
        streams[lo:hi],
        CodecConfig(block_len=256),
        local_stream_ids=ids[lo:hi],
        local_cadences=cads[lo:hi],
        parts_dir=parts_dir,
    )
    if int(pid) == 0:
        with open(outfile, "wb") as f:
            f.write(write_frame(frame))
    jax.effects_barrier()


if __name__ == "__main__":
    main()

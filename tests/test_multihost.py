"""Simulated multi-host (2 local processes, localhost TCP) frame equality.

SURVEY.md §4 "Simulated multi-host": asserts the multi-host ordered gather
produces byte-identical frames to a single-process run.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from dctpu.codec import api as xcodec
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.format import read_frame, write_frame

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_frame_equality(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = tmp_path / "mh.dcf"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             coord, "2", str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-3000:]

    # single-process reference
    streams, ids, cads = synth_corpus(6, 2000, seed=77, mixed_cadence=True,
                                      cumulative_frac=0.4)
    single = write_frame(
        xcodec.compress(streams, CodecConfig(block_len=256),
                        stream_ids=ids, cadences=cads)
    )
    multi = out.read_bytes()
    assert multi == single

    # and it decodes bit-exactly
    dec = xcodec.decompress(read_frame(multi))
    for a, b in zip(streams, dec):
        assert np.array_equal(a, b)


def test_four_process_files_gather(tmp_path):
    """4 processes + O(total)-bytes file gather (VERDICT round 1 items 5/6)."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = tmp_path / "mh4.dcf"
    parts = tmp_path / "parts"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             coord, "4", str(pid), str(out), str(parts)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(4)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-3000:]

    streams, ids, cads = synth_corpus(8, 2000, seed=77, mixed_cadence=True,
                                      cumulative_frac=0.4)
    single = write_frame(
        xcodec.compress(streams, CodecConfig(block_len=256),
                        stream_ids=ids, cadences=cads)
    )
    multi = out.read_bytes()
    assert multi == single

    # every process wrote exactly one ordered shard; total part bytes equal
    # the frame's payload section (the O(total) DCN budget claim)
    part_files = sorted(parts.glob("payload-*.u32"))
    assert len(part_files) == 4
    frame = read_frame(multi)
    assert sum(f.stat().st_size for f in part_files) == frame.payload_words.nbytes

    dec = xcodec.decompress(frame)
    for a, b in zip(streams, dec):
        assert np.array_equal(a, b)

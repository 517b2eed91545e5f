"""Host-feed scalability paths (round-4): vectorized build_blocks /
StreamDir / decompress_flat must be byte-identical to the loop paths."""

import numpy as np
import pytest

from dctpu.codec import api as capi
from dctpu.config import CodecConfig
from dctpu.format.frame import StreamDir, read_frame, write_frame


def _corpus(rng, n_streams, max_len):
    return [
        rng.integers(-(2**20), 2**20, size=int(sz), dtype=np.int32)
        for sz in rng.integers(0, max_len, size=n_streams)
    ]


@pytest.mark.parametrize("L", [128, 256])
def test_build_blocks_flat_matches_loop(L):
    rng = np.random.default_rng(3)
    streams = _corpus(rng, 40, 3 * L + 7)
    lens = np.array([s.size for s in streams], np.int64)
    flat = np.concatenate([s for s in streams]) if streams else np.zeros(0, np.int32)

    x1, n1, h1, nb1, f1 = capi.build_blocks_flat(flat, lens, L)
    # loop path: force it by staying under the flat threshold
    assert len(streams) < capi._FLAT_PATH_MIN_STREAMS
    x2, n2, h2, nb2, f2 = capi.build_blocks(streams, L)
    assert np.array_equal(x1, x2)
    assert np.array_equal(n1, n2)
    assert np.array_equal(h1, h2)
    assert np.array_equal(nb1, nb2)
    assert np.array_equal(f1, f2)


def test_build_blocks_dispatches_flat_path_consistently():
    rng = np.random.default_rng(4)
    streams = _corpus(rng, capi._FLAT_PATH_MIN_STREAMS + 10, 300)
    L = 128
    x1, n1, h1, nb1, f1 = capi.build_blocks(streams, L)  # flat path
    # reference: loop path applied manually
    old = capi._FLAT_PATH_MIN_STREAMS
    try:
        capi._FLAT_PATH_MIN_STREAMS = 10**9
        x2, n2, h2, nb2, f2 = capi.build_blocks(streams, L)
    finally:
        capi._FLAT_PATH_MIN_STREAMS = old
    assert np.array_equal(x1, x2)
    assert np.array_equal(n1, n2)
    assert np.array_equal(h1, h2)


def test_streamdir_frame_roundtrip_and_flat_decode():
    rng = np.random.default_rng(5)
    streams = _corpus(rng, 30, 500)
    cfg = CodecConfig(block_len=128, coder="adaptive")
    fr = capi.compress(streams, cfg)
    assert isinstance(fr.streams, StreamDir)  # vectorized directory
    data = write_frame(fr)
    fr2 = read_frame(data)
    assert isinstance(fr2.streams, StreamDir)
    assert len(fr2.streams) == len(streams)
    out = capi.decompress(fr2)
    for got, want in zip(out, streams):
        assert np.array_equal(got, want)
    flat, lens = capi.decompress_flat(fr2)
    assert np.array_equal(lens, [s.size for s in streams])
    assert np.array_equal(flat, np.concatenate(streams))


def test_streamdir_list_compat():
    sd = StreamDir(
        stream_id=[5, 6],
        cadence_s=[900, 60],
        num_samples=[10, 20],
        num_blocks=[1, 1],
        first_block=[0, 1],
    )
    assert len(sd) == 2
    assert sd[1].cadence_s == 60
    assert [m.stream_id for m in sd] == [5, 6]
    both = sd + sd
    assert isinstance(both, list) and len(both) == 4

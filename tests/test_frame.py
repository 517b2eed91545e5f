"""DCF1 frame serializer tests: round-trip, CRC detection, layout invariants."""

import numpy as np
import pytest

from dctpu.codec import scalar
from dctpu.config import CodecConfig
from dctpu.format import frame as F
from dctpu.format import raw
from tests.conftest import stream_cases


def _example_frame(rng):
    streams = stream_cases(rng)[:4]
    return streams, scalar.scalar_compress(streams, CodecConfig(block_len=512))


def test_frame_bytes_roundtrip(rng):
    streams, fr = _example_frame(rng)
    data = F.write_frame(fr)
    fr2 = F.read_frame(data)
    assert fr2.block_len == fr.block_len
    assert len(fr2.streams) == len(fr.streams)
    for a, b in zip(fr.streams, fr2.streams):
        assert (a.stream_id, a.num_samples, a.num_blocks, a.first_block) == (
            b.stream_id, b.num_samples, b.num_blocks, b.first_block)
    for field in ("predictor", "k", "n", "bit_len", "table_idx", "history"):
        assert np.array_equal(getattr(fr.blocks, field), getattr(fr2.blocks, field))
    assert fr2.tables == fr.tables
    assert np.array_equal(fr2.payload_words, fr.payload_words)
    # decode from the reread frame
    out = scalar.scalar_decompress(fr2)
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)


def test_write_is_deterministic(rng):
    streams, fr = _example_frame(rng)
    assert F.write_frame(fr) == F.write_frame(fr)


def test_crc_detects_corruption(rng):
    _, fr = _example_frame(rng)
    data = bytearray(F.write_frame(fr))
    data[len(data) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        F.read_frame(bytes(data))


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        F.read_frame(b"\x00" * 128)


def test_raw_container_roundtrip(rng):
    streams = stream_cases(rng)[:5]
    data = raw.write_raw(streams, stream_ids=[9, 8, 7, 6, 5], cadences=[60] * 5)
    out, ids, cads = raw.read_raw(data)
    assert ids == [9, 8, 7, 6, 5]
    assert cads == [60] * 5
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)


def test_plan_blocks():
    nb, first = F.plan_blocks([0, 1, 4096, 4097, 10000], 4096)
    assert nb.tolist() == [0, 1, 1, 2, 3]
    assert first.tolist() == [0, 0, 1, 2, 4]

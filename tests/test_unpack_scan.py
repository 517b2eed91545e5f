"""Shift-buffer Rice decode (kernels/unpack_scan.py) vs the pointer-based
unpack and the scalar reference: identical samples on every corpus, plus the
host staging helpers. decompress() defaults to this path, so the oracle and
round-trip suites exercise it too; these tests pin the equivalence directly.
"""

import numpy as np

from dctpu.codec import api as xcodec
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.kernels.unpack_scan import (
    BUF_BUCKETS,
    buf_bucket,
    max_sub_bits_host,
    stage_rice_scan,
)

from conftest import stream_cases


def _roundtrip_both(streams, cfg):
    frame = xcodec.compress(streams, cfg)
    scan = xcodec.decompress(frame, backend="scan")
    xla = xcodec.decompress(frame, backend="xla")
    for s, a, b in zip(streams, scan, xla):
        s = np.asarray(s, dtype=np.int32)
        assert np.array_equal(a, s)
        assert np.array_equal(b, s)


def test_scan_adversarial(rng):
    _roundtrip_both(stream_cases(rng), CodecConfig(block_len=256))


def test_scan_corpus_default_blocks():
    streams, _, _ = synth_corpus(
        4, 9000, seed=11, mixed_cadence=True, cumulative_frac=0.5
    )
    _roundtrip_both(streams, CodecConfig())


def test_scan_escape_heavy(rng):
    # full-range random -> all-escape sub-blocks, the 192-word bucket
    x = rng.integers(-(2**31), 2**31, size=5000, dtype=np.int64).astype(np.int32)
    _roundtrip_both([x], CodecConfig(block_len=1024))


def test_scan_chunk_boundaries(rng):
    streams, _, _ = synth_corpus(3, 3000, seed=5)
    frame = xcodec.compress(streams, CodecConfig(block_len=256))
    a = xcodec.decompress(frame, chunk_blocks=4, backend="scan")
    b = xcodec.decompress(frame, chunk_blocks=64, backend="scan")
    for s, x, y in zip(streams, a, b):
        assert np.array_equal(x, np.asarray(s, np.int32))
        assert np.array_equal(x, y)


def test_buf_bucket_bounds():
    assert buf_bucket(0) == BUF_BUCKETS[0]
    assert buf_bucket(1) == BUF_BUCKETS[0]
    assert buf_bucket(128 * 48) == 192  # format worst case fits the top bucket
    for bits in (100, 1000, 4000, 6144):
        ub = buf_bucket(bits)
        assert ub * 32 >= bits


def test_staging_matches_sync(rng):
    streams, _, _ = synth_corpus(2, 4000, seed=9)
    frame = xcodec.compress(streams, CodecConfig(block_len=512))
    off = frame.blocks.word_offsets(512)
    mb = max_sub_bits_host(frame.payload_words, off, 512)
    assert 0 < mb <= 128 * 48
    ub = buf_bucket(mb)
    staged = stage_rice_scan(frame.payload_words, off, 512, ub)
    assert staged.shape[0] == frame.blocks.num_blocks
    # sync tables are copied verbatim
    from dctpu.constants import sync_words

    SW = sync_words(512)
    first = frame.payload_words[off[0] : off[0] + SW]
    assert np.array_equal(staged[0, :SW], first)


def test_buf_bucket_rejects_corrupt_sync():
    # 6144 bits = 128 * MAX_CODE_BITS is the normative worst case; anything
    # above it can only come from a corrupt sync table and must fail loudly.
    import pytest

    assert buf_bucket(128 * 48) == 192
    with pytest.raises(ValueError):
        buf_bucket(128 * 48 + 1)

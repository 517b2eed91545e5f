"""Unit + property tests for the scalar reference codec (docs/FORMAT.md)."""

import numpy as np
import pytest

from dctpu.codec import scalar
from dctpu.config import CodecConfig, DEFAULT_LPC_TABLES
from dctpu.constants import DELTA, DOUBLE_DELTA, LPC
from tests.conftest import stream_cases


# ----------------------------------------------------------------- zigzag

def test_zigzag_golden():
    r = np.array([0, -1, 1, -2, 2, 2**31 - 1, -(2**31)], dtype=np.int32)
    z = scalar.zigzag(r)
    assert z.tolist() == [0, 1, 2, 3, 4, 0xFFFFFFFE, 0xFFFFFFFF]
    assert np.array_equal(scalar.unzigzag(z), r)


def test_zigzag_roundtrip_full_range(rng):
    r = rng.integers(-(2**31), 2**31, size=10000, dtype=np.int64).astype(np.int32)
    assert np.array_equal(scalar.unzigzag(scalar.zigzag(r)), r)


# ----------------------------------------------------------------- predictors

@pytest.mark.parametrize("pred,table", [(DELTA, None), (DOUBLE_DELTA, None)]
                         + [(LPC, t) for t in DEFAULT_LPC_TABLES])
def test_predictor_roundtrip(rng, pred, table):
    for n in (1, 2, 3, 5, 100):
        x = rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype(np.int32)
        h = rng.integers(-(2**31), 2**31, size=4, dtype=np.int64).astype(np.int32)
        r = scalar.residuals(x, h, pred, table)
        assert np.array_equal(scalar.reconstruct(r, h, pred, table), x)


def test_delta_golden():
    x = np.array([5, 7, 4], dtype=np.int32)
    h = np.array([2, 0, 0, 0], dtype=np.int32)
    r = scalar.residuals(x, h, DELTA, None)
    assert r.tolist() == [3, 2, -3]


def test_double_delta_golden():
    x = np.array([10, 13, 17], dtype=np.int32)
    h = np.array([8, 7, 0, 0], dtype=np.int32)
    # r_0 = 10 - 2*8 + 7 = 1 ; r_1 = 13 - 20 + 8 = 1 ; r_2 = 17 - 26 + 10 = 1
    r = scalar.residuals(x, h, DOUBLE_DELTA, None)
    assert r.tolist() == [1, 1, 1]


def test_wraparound_delta():
    x = np.array([2**31 - 1, -(2**31)], dtype=np.int32)
    h = np.zeros(4, dtype=np.int32)
    r = scalar.residuals(x, h, DELTA, None)
    assert np.array_equal(scalar.reconstruct(r, h, DELTA, None), x)


# ----------------------------------------------------------------- rice

def test_rice_codeword_golden():
    # z=5, k=1: q=2 -> bits 110 then 0 then low bit 1 -> code 0b1011? LSB-first:
    # ones at bits 0,1; zero at bit 2; value bit (5&1)=1 at bit 3 => 0b1011 = 11
    code, ln = scalar.rice_codeword(5, 1)
    assert (code, ln) == (0b1011, 4)
    # escape: z >= 16<<k
    code, ln = scalar.rice_codeword(1 << 20, 0)
    assert ln == 48
    assert code & 0xFFFF == 0xFFFF
    assert code >> 16 == 1 << 20


def test_choose_k_geometric(rng):
    z = rng.geometric(1 / 300.0, size=4096).astype(np.uint32)
    k, bits = scalar.choose_k(z, 24)
    # optimal k for mean ~300 is around log2(300) ~ 8
    assert 5 <= k <= 11
    for kk in range(25):
        assert int(scalar.rice_code_lengths(z, kk).sum()) >= bits


def test_pack_bits_golden():
    words, n = scalar.pack_bits([(0b1, 1), (0b10, 2), (0xFFFFFFFF, 32)])
    # stream: bit0=1, bits1-2=01, bits3-34 all ones
    assert n == 35
    assert words[0] == np.uint32(0b1 | (0b10 << 1) | (0xFFFFFFFF << 3) & 0xFFFFFFFF)
    assert words[1] == np.uint32(0xFFFFFFFF >> 29)


# ----------------------------------------------------------------- block round trip

def test_block_roundtrip(rng):
    cfg = CodecConfig()
    for case in stream_cases(rng):
        x = case[: cfg.block_len]
        h = np.zeros(4, dtype=np.int32)
        pred, k, ti, _coder, bl, words = scalar.scalar_encode_block(x, h, cfg)
        table = cfg.lpc_tables[ti] if pred == LPC else None
        got = scalar.scalar_decode_block(words, x.size, pred, k, h, table, cfg.block_len)
        assert np.array_equal(got, x)


# ----------------------------------------------------------------- frame round trip

def test_compress_decompress_streams(rng):
    cfg = CodecConfig(block_len=256)  # small blocks -> many partial/edge blocks
    streams = stream_cases(rng)
    frame = scalar.scalar_compress(streams, cfg)
    out = scalar.scalar_decompress(frame)
    assert len(out) == len(streams)
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)


def test_empty_stream():
    frame = scalar.scalar_compress([np.zeros(0, dtype=np.int32), np.arange(10, dtype=np.int32)])
    out = scalar.scalar_decompress(frame)
    assert out[0].size == 0
    assert np.array_equal(out[1], np.arange(10, dtype=np.int32))


def test_compression_actually_compresses(rng):
    # smooth ramp: delta residuals tiny -> strong compression
    x = (np.arange(8192, dtype=np.int32) * 3).astype(np.int32)
    frame = scalar.scalar_compress([x])
    compressed_bits = int(frame.blocks.bit_len.sum())
    assert compressed_bits < 8192 * 32 / 4  # >4x on a pure ramp

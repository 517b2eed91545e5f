"""VERTICAL coder (FORMAT §2.2): cross-impl byte equality + round trips."""

import subprocess

import numpy as np
import pytest

from dctpu.codec import api as xcodec
from dctpu.codec import scalar
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.format import read_frame, write_frame, write_raw
from tests.conftest import stream_cases
from tests.test_oracle import ORACLE, oracle_bin  # noqa: F401


def _vcfg(L=256):
    return CodecConfig(block_len=L, coder="vertical")


def test_scalar_vertical_roundtrip(rng):
    streams = stream_cases(rng)
    fr = scalar.scalar_compress(streams, _vcfg())
    out = scalar.scalar_decompress(read_frame(write_frame(fr)))
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)


def test_xla_vertical_matches_scalar(rng):
    streams = stream_cases(rng)
    cfg = _vcfg()
    py = write_frame(scalar.scalar_compress(streams, cfg))
    xb = write_frame(xcodec.compress(streams, cfg))
    assert xb == py
    out = xcodec.decompress(read_frame(xb))
    for a, b in zip(streams, out):
        assert np.array_equal(np.asarray(a, np.int32), b)


def test_xla_vertical_corpus_block4096():
    streams, _, _ = synth_corpus(3, 9000, seed=31, mixed_cadence=True,
                                 cumulative_frac=0.5)
    cfg = CodecConfig(coder="vertical")  # block_len 4096
    py = write_frame(scalar.scalar_compress(streams, cfg))
    xb = write_frame(xcodec.compress(streams, cfg))
    assert xb == py
    out = xcodec.decompress(read_frame(xb))
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)


def test_oracle_vertical_matches(tmp_path, oracle_bin, rng):
    streams = stream_cases(rng)[:6]
    dcr = tmp_path / "v.dcr"
    dcr.write_bytes(write_raw(streams))
    dcf = tmp_path / "v.dcf"
    subprocess.run(
        [oracle_bin, "encode", str(dcr), str(dcf), "--coder", "vertical"],
        check=True, capture_output=True,
    )
    py = write_frame(scalar.scalar_compress(streams, CodecConfig(coder="vertical")))
    assert dcf.read_bytes() == py
    # oracle decodes a python vertical frame
    out_dcr = tmp_path / "o.dcr"
    subprocess.run([oracle_bin, "decode", str(dcf), str(out_dcr)],
                   check=True, capture_output=True)
    from dctpu.format import read_raw

    out, _, _ = read_raw(out_dcr.read_bytes())
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)


def test_vertical_escape_heavy(rng):
    x = rng.integers(-(2**31), 2**31, size=3000, dtype=np.int64).astype(np.int32)
    cfg = _vcfg(1024)
    py = write_frame(scalar.scalar_compress([x], cfg))
    xb = write_frame(xcodec.compress([x], cfg))
    assert xb == py
    out = xcodec.decompress(read_frame(xb))
    assert np.array_equal(out[0], x)


def test_vertical_constant_stream_is_tiny():
    x = np.full(8192, 1234, np.int32)
    fr = xcodec.compress([x], CodecConfig(coder="vertical"))
    # constant stream -> all-zero residuals except the stream-start sample,
    # which becomes a single exception (2 words) in the first sub-block
    assert int(fr.blocks.bit_len.sum()) <= 64
    out = xcodec.decompress(read_frame(write_frame(fr)))
    assert np.array_equal(out[0], x)


def test_sharded_vertical_matches_single(rng):
    import jax
    from dctpu.dist import compress_sharded, decompress_sharded, make_mesh

    streams = stream_cases(rng)[:6]
    cfg = _vcfg(512)
    mesh = make_mesh()
    single = write_frame(xcodec.compress(streams, cfg))
    shard = write_frame(compress_sharded(streams, cfg, mesh))
    assert shard == single
    out = decompress_sharded(read_frame(shard), mesh)
    for a, b in zip(streams, out):
        assert np.array_equal(np.asarray(a, np.int32), b)


def test_exceed_from_planes_matches_exceed_counts(rng):
    """r4: the transpose-reusing exceed table must equal the smear one."""
    import jax.numpy as jnp

    from dctpu.kernels.vertical_xla import (
        bit_transpose32,
        exceed_counts,
        exceed_from_planes,
    )

    zs = (rng.geometric(0.05, size=(5, 8, 128)) - 1).astype(np.uint32)
    zs[0, 0] = 0
    zs[1, 1] = 0xFFFFFFFF
    zj = jnp.asarray(zs)
    want = exceed_counts(zj)
    got = exceed_from_planes(bit_transpose32(zj.reshape(5, 8, 4, 32)))
    assert np.array_equal(np.asarray(want), np.asarray(got))

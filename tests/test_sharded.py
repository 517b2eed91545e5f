"""Simulated multi-device tests on the fake 8-device CPU mesh (SURVEY.md §4).

Invariant: sharded encode produces byte-identical frames to single-device
encode (and hence to the scalar reference and the C++ oracle).
"""

import jax
import numpy as np
import pytest

from dctpu.codec import api as xcodec
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.dist import compress_sharded, decompress_sharded, make_mesh
from dctpu.format import read_frame, write_frame
from tests.conftest import stream_cases


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 fake CPU devices"
    return make_mesh()


def test_sharded_encode_matches_single_device(mesh):
    streams, ids, cads = synth_corpus(5, 3000, seed=13, mixed_cadence=True,
                                      cumulative_frac=0.4)
    cfg = CodecConfig(block_len=256)
    single = write_frame(xcodec.compress(streams, cfg, stream_ids=ids, cadences=cads))
    shard = write_frame(
        compress_sharded(streams, cfg, mesh, stream_ids=ids, cadences=cads)
    )
    assert shard == single


def test_sharded_roundtrip_adversarial(mesh, rng):
    streams = stream_cases(rng)
    cfg = CodecConfig(block_len=512)
    frame = compress_sharded(streams, cfg, mesh)
    out = decompress_sharded(read_frame(write_frame(frame)), mesh)
    for a, b in zip(streams, out):
        assert np.array_equal(np.asarray(a, np.int32), b)


def test_sharded_decode_matches_unsharded(mesh):
    streams, _, _ = synth_corpus(4, 5000, seed=17, cumulative_frac=0.5)
    cfg = CodecConfig(block_len=1024)
    frame = read_frame(write_frame(xcodec.compress(streams, cfg)))
    a = xcodec.decompress(frame)
    b = decompress_sharded(frame, mesh)
    for u, v in zip(a, b):
        assert np.array_equal(u, v)


def test_sharded_nondivisible_block_count(mesh):
    # 3 blocks over 8 devices: padding path
    streams = [np.arange(3 * 300, dtype=np.int32)]
    cfg = CodecConfig(block_len=300)
    single = write_frame(xcodec.compress(streams, cfg))
    shard = write_frame(compress_sharded(streams, cfg, mesh))
    assert shard == single

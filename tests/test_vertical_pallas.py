"""Pallas vertical decode vs XLA vertical decode, bit-for-bit (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dctpu.codec import api as xcodec
from dctpu.codec.vertical_host import max_plane_width
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.format import read_frame, write_frame
from dctpu.kernels.vertical_pallas import decode_vertical_staged
from dctpu.kernels.vertical_xla import decode_vertical, plane_bucket
from tests.conftest import stream_cases


@pytest.mark.parametrize("L", [256, 4096])
def test_pallas_vertical_decode_matches_xla(rng, L):
    streams = stream_cases(rng)
    cfg = CodecConfig(block_len=L, coder="vertical")
    frame = xcodec.compress(streams, cfg)
    padded, coder = xcodec.stage_frame_payload(frame)
    assert coder == "vertical"
    n = jnp.asarray(frame.blocks.n.astype(np.int32))
    pd = jnp.asarray(padded)
    mp = plane_bucket(max_plane_width(padded, L))
    z_x = decode_vertical(pd, n, L, mp)
    z_p = decode_vertical_staged(pd, n, L, mp, interpret=True)
    assert np.array_equal(np.asarray(z_x), np.asarray(z_p))


def test_pallas_exc_extraction_matches_xla(rng):
    from dctpu.kernels.vertical_pallas import exc_extract_pallas
    from dctpu.kernels.vertical_xla import exc_extract_xla

    B, S = 7, 32
    zs = (rng.geometric(0.08, size=(B, S, 128)) - 1).astype(np.uint32)
    for i in range(B):  # ragged tails
        zs[i, -1, rng.integers(0, 129):] = 0
    b = rng.integers(0, 33, size=(B, S)).astype(np.int32)
    b[0] = 0   # every nonzero sample is an exception
    b[1] = 32  # no exceptions possible
    px, vx = exc_extract_xla(jnp.asarray(zs), jnp.asarray(b))
    pp, vp = exc_extract_pallas(jnp.asarray(zs), jnp.asarray(b), interpret=True)
    assert np.array_equal(np.asarray(px), np.asarray(pp))
    assert np.array_equal(np.asarray(vx), np.asarray(vp))


def test_encode_backend_pallas_payload_identical(rng):
    """encode_blocks backend='pallas' must produce byte-identical frames."""
    from dctpu.codec.encode import encode_blocks
    from dctpu.codec import api as capi

    streams = stream_cases(rng)
    cfg = CodecConfig(coder="vertical")
    x, n, hist, _, _ = capi.build_blocks(streams, cfg.block_len)
    e_x = encode_blocks(jnp.asarray(x), jnp.asarray(n), jnp.asarray(hist), cfg, "xla")
    e_p = encode_blocks(jnp.asarray(x), jnp.asarray(n), jnp.asarray(hist), cfg, "pallas")
    assert np.array_equal(np.asarray(e_x.payload), np.asarray(e_p.payload))
    assert np.array_equal(np.asarray(e_x.bit_len), np.asarray(e_p.bit_len))

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

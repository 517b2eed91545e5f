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


def test_region_pack_matches_xla_path(rng):
    """region_pack_pallas (interpret) == the XLA repack+roll formulation,
    including n_exc=0, full-width b=32, and posw in {0..4}."""
    import jax.numpy as jnp

    from dctpu.kernels import ragged
    from dctpu.kernels.vertical_pallas import region_pack_pallas
    from dctpu.kernels.vertical_xla import PLANE_REGION, POS_REGION, REGION_WORDS

    R = 37
    region = rng.integers(0, 2**32, size=(R, REGION_WORDS),
                          dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 33, size=R).astype(np.int32)
    n_exc = rng.integers(0, 17, size=R).astype(np.int32)
    b[0], n_exc[0] = 0, 0
    b[1], n_exc[1] = 32, 16
    b[2], n_exc[2] = 5, 0
    # encoder invariant: val slots beyond 16 don't exist; slots are full u32

    got = np.asarray(region_pack_pallas(
        jnp.asarray(region), jnp.asarray(b), jnp.asarray(n_exc),
        interpret=True,
    ))

    # XLA reference (pw=4): plane prefix + gap-closed tail rolled to 4b
    r3 = jnp.asarray(region)[None, :, :]  # [1, R, W] as [B, S, W]
    planes = r3[:, :, :PLANE_REGION]
    slot = jnp.arange(PLANE_REGION, dtype=jnp.int32)[None, None, :]
    planes = jnp.where(slot < 4 * jnp.asarray(b)[None, :, None],
                       planes, jnp.uint32(0))
    tail = r3[:, :, PLANE_REGION:]
    posw = ((jnp.asarray(n_exc) + 3) // 4)[None, :, None]
    tslot = jnp.arange(REGION_WORDS - PLANE_REGION, dtype=jnp.int32)[None, None, :]
    vals_down = ragged._roll_down_by(tail, POS_REGION - posw, 1)
    tail = jnp.where(tslot < posw, tail, vals_down)
    tail = jnp.pad(tail, ((0, 0), (0, 0),
                          (0, ragged.REGION_PAD - (REGION_WORDS - PLANE_REGION))))
    packed = jnp.pad(planes, ((0, 0), (0, 0),
                              (0, ragged.REGION_PAD - PLANE_REGION)))
    rolled = ragged._roll_up_by(tail, jnp.asarray(b)[None, :, None], 4)
    want = np.asarray((packed | rolled)[0])
    assert np.array_equal(got, want)

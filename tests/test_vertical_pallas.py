"""Pallas exception-extraction kernel vs the XLA formulation (interpret).

The decode twin (decode_vertical_pallas) and region_pack_pallas were
retired in r4 — see dctpu/kernels/attic/__init__.py and the vertical_xla
REGION_PAD note for the head-to-head numbers and the packed-layout change
that made them moot.
"""

import jax.numpy as jnp
import numpy as np

from dctpu.config import CodecConfig
from tests.conftest import stream_cases


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
    """encode_blocks backend='pallas' must produce byte-identical payloads."""
    from dctpu.codec.encode import encode_blocks
    from dctpu.codec import api as capi

    streams = stream_cases(rng)
    cfg = CodecConfig(coder="vertical")
    x, n, hist, _, _ = capi.build_blocks(streams, cfg.block_len)
    e_x = encode_blocks(jnp.asarray(x), jnp.asarray(n), jnp.asarray(hist), cfg, "xla")
    e_p = encode_blocks(jnp.asarray(x), jnp.asarray(n), jnp.asarray(hist), cfg, "pallas")
    assert np.array_equal(np.asarray(e_x.payload), np.asarray(e_p.payload))
    assert np.array_equal(np.asarray(e_x.bit_len), np.asarray(e_p.bit_len))

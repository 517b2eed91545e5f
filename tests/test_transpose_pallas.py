"""grouped_bit_transpose32 (in-kernel butterfly) vs the XLA transpose."""

import jax.numpy as jnp
import numpy as np

from dctpu.kernels.transpose_pallas import grouped_bit_transpose32
from dctpu.kernels.vertical_xla import bit_transpose32


def test_grouped_transpose_matches_xla(rng):
    R = 70
    x = rng.integers(0, 2**32, size=(R, 4, 32), dtype=np.uint64).astype(
        np.uint32
    )
    x[0] = 0
    x[1] = 0xFFFFFFFF
    xj = jnp.asarray(x)
    want = np.asarray(bit_transpose32(xj))
    xr = jnp.asarray(x[..., ::-1].reshape(R, 128))
    out = np.asarray(
        grouped_bit_transpose32(xr, interpret=True, tr=64)
    ).reshape(R, 4, 32)[..., ::-1]
    assert np.array_equal(out, want)
    # self-inverse through the same wrapping (transpose twice = identity)
    back = np.asarray(
        grouped_bit_transpose32(
            jnp.asarray(out[..., ::-1].reshape(R, 128)),
            interpret=True, tr=64,
        )
    ).reshape(R, 4, 32)[..., ::-1]
    assert np.array_equal(back, x)

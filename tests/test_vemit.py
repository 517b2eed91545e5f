"""Emit mega-kernel (vemit_pallas) vs the XLA emit, bit-exact payloads."""

import jax.numpy as jnp
import numpy as np

from dctpu.kernels.vertical_xla import encode_vertical


def _payloads(z, n, L):
    zj, nj = jnp.asarray(z), jnp.asarray(n)
    p_ref, bl_ref = encode_vertical(zj, nj, L, exc_backend="xla")
    p_mega, bl_mega = encode_vertical(zj, nj, L, exc_backend="mega")
    return (
        np.asarray(p_ref), np.asarray(bl_ref),
        np.asarray(p_mega), np.asarray(bl_mega),
    )


def test_mega_emit_matches_xla(rng):
    for L in (256, 200, 4096):
        B = 6
        z = (rng.geometric(0.03, size=(B, L)) - 1).astype(np.uint32)
        z[0, :29] = 0xFFFFFFFF          # many max-width exceptions
        z[1] = 0                        # all-zero block (b=0 everywhere)
        z[2, 5] = 0x7FFFFFFF            # single huge exception
        n = np.full(B, L, np.int32)
        n[-1] = max(1, L - 57)          # ragged tail
        n[-2] = 0                       # empty block
        n[3] = min(L, 128)              # cut at sub-block boundary
        p_ref, bl_ref, p_mega, bl_mega = _payloads(z, n, L)
        assert np.array_equal(bl_ref, bl_mega), L
        assert np.array_equal(p_ref, p_mega), L


def test_mega_decode_matches_xla(rng):
    """encode -> decode_vertical_mega == decode_vertical, bit-exact."""
    from dctpu.kernels.vdec_pallas import decode_vertical_mega
    from dctpu.kernels.vertical_xla import decode_vertical

    for L in (256, 4096):  # mega decode requires L % 128 == 0
        B = 6
        z = (rng.geometric(0.03, size=(B, L)) - 1).astype(np.uint32)
        z[0, :29] = 0xFFFFFFFF
        z[1] = 0
        z[2, 5] = 0x7FFFFFFF
        # force a bit-planed value layout somewhere: many exceptions with
        # a wide spread of magnitudes at a small base width
        z[4, :] = rng.integers(0, 4, size=L).astype(np.uint32)
        z[4, : 16] = (1 << rng.integers(20, 31, size=16)).astype(np.uint32)
        n = np.full(B, L, np.int32)
        n[-1] = max(1, L - 57)
        n[-2] = 0
        zj, nj = jnp.asarray(z), jnp.asarray(n)
        payload, _ = encode_vertical(zj, nj, L, exc_backend="xla")
        z_ref = np.asarray(decode_vertical(payload, nj, L))
        z_mega = np.asarray(decode_vertical_mega(payload, nj, L))
        assert np.array_equal(z_ref, z_mega), L


def test_mega_emit_exception_stress(rng):
    """Exception counts swept 0..EXC_CAP at scattered positions."""
    L = 256
    B = 17
    z = np.zeros((B, L), np.uint32)
    z[:, :] = rng.integers(0, 8, size=(B, L)).astype(np.uint32)
    for i in range(B):
        ne = i % 17
        pos = rng.choice(L, size=ne, replace=False)
        z[i, pos] = (1 << rng.integers(4, 31, size=ne)).astype(np.uint32)
    n = np.full(B, L, np.int32)
    p_ref, bl_ref, p_mega, bl_mega = _payloads(z, n, L)
    assert np.array_equal(bl_ref, bl_mega)
    assert np.array_equal(p_ref, p_mega)

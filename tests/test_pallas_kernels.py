"""Pallas pack/unpack vs pure-XLA v0, bit-for-bit (SURVEY.md §4 "Kernel").

Runs in interpret mode on the CPU backend so kernels are testable without a
TPU; the identical kernels compile on TPU (exercised by bench/TPU runs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dctpu.codec import rice
from dctpu.codec.api import build_blocks
from dctpu.corpus import synth_corpus
from dctpu.kernels.pack_pallas import pack_pallas
from dctpu.kernels.pack_xla import pack_xla
from dctpu.kernels.unpack_pallas import unpack_pallas
from dctpu.kernels.unpack_xla import unpack_xla


def _block_batch(rng, L, kind="corpus"):
    if kind == "corpus":
        streams, _, _ = synth_corpus(2, 4 * L, seed=5, cumulative_frac=0.5)
    else:
        streams = [
            rng.integers(-(2**31), 2**31, size=3 * L + 7, dtype=np.int64).astype(np.int32)
        ]
    x, n, hist, _, _ = build_blocks(streams, L)
    z = rice.zigzag(jnp.asarray(x) - jnp.asarray(np.roll(x, 1, axis=1)))
    k = jnp.asarray((np.arange(x.shape[0]) % 7).astype(np.int32))
    nn = jnp.asarray(n)
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < nn[:, None]
    return z, k, nn, valid


@pytest.mark.parametrize("L", [128, 256, 4096])
@pytest.mark.parametrize("kind", ["corpus", "random"])
def test_pack_pallas_matches_xla(rng, L, kind):
    z, k, n, valid = _block_batch(rng, L, kind)
    lo, hi, ln = rice.codewords(z, k[:, None])
    p_x, bl_x = pack_xla(lo, hi, ln, valid, L)
    p_p, bl_p = pack_pallas(lo, hi, ln, valid, L, interpret=True)
    assert np.array_equal(np.asarray(bl_x), np.asarray(bl_p))
    assert np.array_equal(np.asarray(p_x), np.asarray(p_p))


@pytest.mark.parametrize("L", [128, 256, 4096])
@pytest.mark.parametrize("kind", ["corpus", "random"])
def test_unpack_pallas_matches_xla(rng, L, kind):
    z, k, n, valid = _block_batch(rng, L, kind)
    lo, hi, ln = rice.codewords(z, k[:, None])
    payload, _ = pack_xla(lo, hi, ln, valid, L)
    payload = jnp.pad(payload, ((0, 0), (0, 2)))
    z_x = unpack_xla(payload, k, n, L)
    z_p = unpack_pallas(payload, k, n, L, interpret=True)
    assert np.array_equal(np.asarray(z_x), np.asarray(z_p))
    zm = np.asarray(z) * np.asarray(valid)
    assert np.array_equal(np.asarray(z_x), zm)

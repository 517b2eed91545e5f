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
from dctpu.kernels.attic.pack_pallas import pack_pallas
from dctpu.kernels.pack_xla import pack_xla
from dctpu.kernels.attic.unpack_pallas import unpack_pallas
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
def test_unpack_pallas_matches_scan(rng, L, kind):
    from dctpu.format.frame import payload_word_counts
    from dctpu.kernels.unpack_scan import (
        buf_bucket,
        max_sub_bits_host,
        stage_rice_scan,
        unpack_scan,
    )

    z, k, n, valid = _block_batch(rng, L, kind)
    lo, hi, ln = rice.codewords(z, k[:, None])
    payload, bl = pack_xla(lo, hi, ln, valid, L)
    # compact to a flat disk-word stream, then stage rows (decode contract)
    wc = payload_word_counts(np.asarray(bl), L)
    off = np.zeros(wc.size + 1, np.int64)
    np.cumsum(wc, out=off[1:])
    pnp = np.asarray(payload)
    flat = np.concatenate(
        [pnp[i, : wc[i]] for i in range(pnp.shape[0])]
    ) if pnp.shape[0] else np.zeros(0, np.uint32)
    ub = buf_bucket(max_sub_bits_host(flat, off, L))
    staged = jnp.asarray(stage_rice_scan(flat, off, L, ub))
    z_s = unpack_scan(staged, k, n, L, ub)
    z_p = unpack_pallas(staged, k, n, L, ub, interpret=True)
    assert np.array_equal(np.asarray(z_s), np.asarray(z_p))
    z_x = unpack_xla(jnp.pad(payload, ((0, 0), (0, 2))), k, n, L)
    assert np.array_equal(np.asarray(z_x), np.asarray(z_p))
    zm = np.asarray(z) * np.asarray(valid)
    assert np.array_equal(np.asarray(z_p), zm)

"""Device ragged transforms vs the tested host implementations, byte-exact."""

import numpy as np
import pytest

from dctpu.codec import api as xcodec
from dctpu.codec.vertical_host import compact_vertical, stage_vertical
from dctpu.config import CodecConfig
from dctpu.constants import subs_per_block, sync_words
from dctpu.corpus import synth_corpus
from dctpu.format.frame import payload_word_counts
from dctpu.kernels import ragged
from dctpu.kernels.unpack_scan import (
    buf_bucket,
    max_sub_bits_host,
    stage_rice_scan,
)


def _frame(rng, coder, block_len=512, n_streams=3, n=3000):
    streams, _, _ = synth_corpus(
        n_streams, n, seed=31, mixed_cadence=True, cumulative_frac=0.3
    )
    streams.append(rng.integers(-(2**25), 2**25, 700, np.int64).astype(np.int32))
    frame = xcodec.compress(streams, CodecConfig(block_len=block_len, coder=coder))
    return streams, frame


def test_compact_rice_semi_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "rice")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    from dctpu.kernels.pack_xla import padded_words

    W = padded_words(L) + 2
    rows = xcodec.pad_payload(
        frame.payload_words, off, frame.blocks.num_blocks, W
    )
    wc = payload_word_counts(frame.blocks.bit_len, L)
    B = frame.blocks.num_blocks
    tc = -(-wc // ragged.RICE_TILE)
    total_tiles = B * (-(-W // ragged.RICE_TILE))
    semi = np.asarray(
        ragged.compact_rice_semi(
            jnp.asarray(rows), jnp.asarray(tc.astype(np.int32)), total_tiles
        )
    )
    src_off = np.zeros(B, np.int64)
    np.cumsum(tc[:-1] * ragged.RICE_TILE, out=src_off[1:])
    out = ragged.squeeze_host(semi, src_off, wc)
    assert np.array_equal(out, frame.payload_words)


def test_compact_enc_payload_device_rice(rng):
    # end-to-end contract: device rows -> exact frame words
    import jax.numpy as jnp

    streams, frame = _frame(rng, "rice")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    from dctpu.kernels.pack_xla import padded_words

    rows = xcodec.pad_payload(
        frame.payload_words, off, frame.blocks.num_blocks, padded_words(L) + 2
    )
    got = xcodec.compact_enc_payload_device(
        jnp.asarray(rows), frame.blocks.bit_len, L, "rice"
    )
    assert np.array_equal(got, frame.payload_words)


def test_compact_enc_payload_device_vertical(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "vertical")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    rows = stage_vertical(frame.payload_words, off, L)  # device-format rows
    got = xcodec.compact_enc_payload_device(
        jnp.asarray(rows), frame.blocks.bit_len, L, "vertical"
    )
    assert np.array_equal(got, frame.payload_words)


def test_stage_rice_scan_device_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "rice")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    ub = buf_bucket(max_sub_bits_host(frame.payload_words, off, L))
    want = stage_rice_scan(frame.payload_words, off, L, ub)
    got = np.asarray(
        ragged.stage_rice_scan_device(
            jnp.asarray(frame.payload_words),
            jnp.asarray(off.astype(np.int32)),
            L,
            ub,
        )
    )
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_stage_vertical_device_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "vertical")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    want = stage_vertical(frame.payload_words, off, L)
    got = np.asarray(
        ragged.stage_vertical_device(
            jnp.asarray(frame.payload_words), jnp.asarray(off.astype(np.int32)), L
        )
    )
    assert np.array_equal(got, want)


def test_subset_semi_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "adaptive")
    L = frame.block_len
    idx = np.nonzero(frame.blocks.coder_arr() == 0)[0]
    if idx.size == 0:
        pytest.skip("no rice blocks in adaptive frame")
    off = frame.blocks.word_offsets(L)
    wch = np.diff(off)[idx]
    tc = -(-wch // ragged.VERT_TILE)
    semi = np.asarray(
        ragged.subset_semi(
            jnp.asarray(frame.payload_words),
            jnp.asarray(off[idx].astype(np.int32)),
            jnp.asarray(wch.astype(np.int32)),
            int(tc.sum()),
        )
    )
    goff8 = np.zeros(idx.size + 1, np.int64)
    np.cumsum(tc * ragged.VERT_TILE, out=goff8[1:])
    for j, bi in enumerate(idx):
        want = frame.payload_words[off[bi] : off[bi + 1]]
        got = semi[goff8[j] : goff8[j] + wch[j]]
        assert np.array_equal(got, want), f"block {bi}"
        pad = semi[goff8[j] + wch[j] : goff8[j + 1]]
        assert not pad.any()


def test_block_len_not_multiple_of_sub(rng):
    # short final sub-block (pw < 4) exercises the pw-grouped repack math
    import jax.numpy as jnp

    streams = [rng.integers(0, 2**20, 1000, np.int64).astype(np.int32)]
    frame = xcodec.compress(streams, CodecConfig(block_len=200, coder="vertical"))
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    want = stage_vertical(frame.payload_words, off, L)
    got = np.asarray(
        ragged.stage_vertical_device(
            jnp.asarray(frame.payload_words), jnp.asarray(off.astype(np.int32)), L
        )
    )
    assert np.array_equal(got, want)
    got_words = xcodec.compact_enc_payload_device(
        jnp.asarray(want), frame.blocks.bit_len, L, "vertical"
    )
    assert np.array_equal(got_words, frame.payload_words)

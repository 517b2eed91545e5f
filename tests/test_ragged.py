"""Device ragged transforms vs the tested host implementations, byte-exact."""

import numpy as np
import pytest

from dctpu.codec import api as xcodec
from dctpu.codec.vertical_host import compact_vertical, stage_vertical
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.format.frame import payload_word_counts
from dctpu.kernels import ragged
from dctpu.kernels.unpack_scan import (
    buf_bucket,
    max_sub_bits_host,
    stage_rice_scan,
)
from dctpu.kernels.vertical_xla import padded_words_vertical


def _frame(rng, coder, block_len=512, n_streams=3, n=3000):
    streams, _, _ = synth_corpus(
        n_streams, n, seed=31, mixed_cadence=True, cumulative_frac=0.3
    )
    streams.append(rng.integers(-(2**25), 2**25, 700, np.int64).astype(np.int32))
    frame = xcodec.compress(streams, CodecConfig(block_len=block_len, coder=coder))
    return streams, frame


def test_compact_prefix_rows_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "rice")
    L = frame.block_len
    # reconstruct padded rows from the frame (host), then compact on device
    off = frame.blocks.word_offsets(L)
    from dctpu.kernels.pack_xla import padded_words

    rows = xcodec.pad_payload(
        frame.payload_words, off, frame.blocks.num_blocks, padded_words(L) + 2
    )
    wc = payload_word_counts(frame.blocks.bit_len, L)
    total = int(wc.sum())
    out = np.asarray(
        ragged.compact_prefix_rows(
            jnp.asarray(rows), jnp.asarray(wc.astype(np.int32)), total + 7
        )
    )
    assert np.array_equal(out[:total], frame.payload_words)
    assert not out[total:].any()


def test_expand_prefix_rows_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "rice")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    from dctpu.kernels.pack_xla import padded_words

    W = padded_words(L) + 2
    want = xcodec.pad_payload(
        frame.payload_words, off, frame.blocks.num_blocks, W
    )
    got = np.asarray(
        ragged.expand_prefix_rows(
            jnp.asarray(frame.payload_words),
            jnp.asarray(off.astype(np.int32)),
            frame.blocks.num_blocks,
            W,
        )
    )
    assert np.array_equal(got, want)


def test_stage_rice_scan_device_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "rice")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)
    mb = max_sub_bits_host(frame.payload_words, off, L)
    md = int(
        ragged.max_sub_bits_device(
            jnp.asarray(frame.payload_words), jnp.asarray(off.astype(np.int32)), L
        )
    )
    assert md == mb
    ub = buf_bucket(mb)
    want = stage_rice_scan(frame.payload_words, off, L, ub)
    got = np.asarray(
        ragged.stage_rice_scan_device(
            jnp.asarray(frame.payload_words),
            jnp.asarray(off.astype(np.int32)),
            L,
            ub,
        )
    )
    # host staging clamps out-of-range reads to the last word; device clips
    # identically, but tail windows past a block's span may differ only in
    # words the decoder never reads. Compare the decoder-visible prefix: all
    # words of subs with nonzero length, plus sync tables.
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_vertical_device_transforms_match_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "vertical")
    L = frame.block_len
    off = frame.blocks.word_offsets(L)

    # staging: disk words -> device rows
    want_rows = stage_vertical(frame.payload_words, off, L)
    got_rows = np.asarray(
        ragged.stage_vertical_device(
            jnp.asarray(frame.payload_words), jnp.asarray(off.astype(np.int32)), L
        )
    )
    assert np.array_equal(got_rows, want_rows)

    # compaction: device rows -> disk words
    want_words, want_wc = compact_vertical(want_rows, L)
    total = int(want_wc.sum())
    got_words = np.asarray(
        ragged.compact_vertical_device(jnp.asarray(want_rows), L, total + 5)
    )
    assert np.array_equal(got_words[:total], want_words)
    assert not got_words[total:].any()

    from dctpu.codec.vertical_host import max_plane_width

    assert int(
        ragged.max_plane_width_device(
            jnp.asarray(frame.payload_words), jnp.asarray(off.astype(np.int32)), L
        )
    ) == max_plane_width(want_rows, L)


def test_subset_compact_matches_host(rng):
    import jax.numpy as jnp

    streams, frame = _frame(rng, "adaptive")
    L = frame.block_len
    B = frame.blocks.num_blocks
    idx = np.nonzero(frame.blocks.coder_arr() == 0)[0]
    if idx.size == 0:
        pytest.skip("no rice blocks in adaptive frame")
    want_words, want_off = xcodec._subset_disk_words(frame, idx)
    off = frame.blocks.word_offsets(L)
    got_words, got_off = ragged.subset_compact(
        jnp.asarray(frame.payload_words),
        jnp.asarray(off.astype(np.int32)),
        jnp.asarray(idx.astype(np.int32)),
        int(want_off[-1]) + 3,
    )
    got_words, got_off = np.asarray(got_words), np.asarray(got_off)
    assert np.array_equal(got_off, want_off)
    assert np.array_equal(got_words[: want_off[-1]], want_words)
    assert not got_words[want_off[-1]:].any()


def test_block_len_not_multiple_of_sub(rng):
    # short final sub-block (pw < 4) exercises the pw-varying layout math
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
    want_words, want_wc = compact_vertical(want, L)
    got_words = np.asarray(
        ragged.compact_vertical_device(jnp.asarray(want), L, int(want_wc.sum()))
    )
    assert np.array_equal(got_words, want_words)

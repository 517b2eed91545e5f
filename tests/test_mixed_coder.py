"""Mixed-coder frame decode: per-coder block grouping (FORMAT §2.2)."""

import numpy as np

from dctpu.codec import api as xcodec
from dctpu.codec import scalar
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.format import read_frame, write_frame
from dctpu.format.frame import BlockHeaders, Frame


def _mixed_frame(streams):
    fr_r = scalar.scalar_compress(streams[:2], CodecConfig(block_len=256))
    fr_v = scalar.scalar_compress(
        streams[2:], CodecConfig(block_len=256, coder="vertical")
    )
    nb = fr_r.blocks.num_blocks
    for s in fr_v.streams:
        s.first_block += nb
    blocks = BlockHeaders(
        predictor=np.concatenate([fr_r.blocks.predictor, fr_v.blocks.predictor]),
        k=np.concatenate([fr_r.blocks.k, fr_v.blocks.k]),
        n=np.concatenate([fr_r.blocks.n, fr_v.blocks.n]),
        bit_len=np.concatenate([fr_r.blocks.bit_len, fr_v.blocks.bit_len]),
        table_idx=np.concatenate([fr_r.blocks.table_idx, fr_v.blocks.table_idx]),
        history=np.concatenate([fr_r.blocks.history, fr_v.blocks.history]),
        coder=np.concatenate([fr_r.blocks.coder_arr(), fr_v.blocks.coder_arr()]),
    )
    return Frame(
        block_len=256,
        streams=fr_r.streams + fr_v.streams,
        blocks=blocks,
        tables=fr_r.tables,
        payload_words=np.concatenate([fr_r.payload_words, fr_v.payload_words]),
    )


def test_mixed_coder_frame_decodes():
    streams, _, _ = synth_corpus(4, 2000, seed=55, cumulative_frac=0.5)
    frame = _mixed_frame(streams)
    data = write_frame(frame)
    for decode in (xcodec.decompress, scalar.scalar_decompress):
        out = decode(read_frame(data))
        for a, b in zip(streams, out):
            assert np.array_equal(a, b)

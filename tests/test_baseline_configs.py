"""The five BASELINE.json config scenarios, scaled to CI size (SURVEY.md §4).

Each config exercises the stated capability end to end; corpus sizes are
scaled down for CPU CI, geometry/structure preserved.
"""

import numpy as np
import pytest

from dctpu.codec import api as xcodec
from dctpu.codec import scalar
from dctpu.config import CodecConfig
from dctpu.constants import DELTA, DOUBLE_DELTA, LPC
from dctpu.corpus import synth_corpus, synth_stream
from dctpu.dist import compress_sharded, decompress_sharded, make_mesh
from dctpu.format import read_frame, write_frame


def _roundtrip(streams, cfg, **kw):
    frame = xcodec.compress(streams, cfg, **kw)
    out = xcodec.decompress(read_frame(write_frame(frame)))
    for a, b in zip(streams, out):
        assert np.array_equal(np.asarray(a, np.int32), b)
    return frame


def test_config1_single_meter_delta_rice(rng):
    """Config 1: 1 stream, 1M int32, delta+Rice (CPU-runnable workhorse)."""
    x = synth_stream(np.random.default_rng(0), 1 << 20, cadence_s=900)
    cfg = CodecConfig(predictors=(DELTA,))
    frame = _roundtrip([x], cfg)
    assert set(frame.blocks.predictor.tolist()) == {DELTA}
    raw, comp = x.nbytes, len(write_frame(frame))
    assert raw / comp > 2.0


def test_config2_1k_meters_double_delta(rng):
    """Config 2: meter batch, double-delta, per-stream blocks, 1 chip."""
    streams, ids, cads = synth_corpus(32, 2048, seed=7, cumulative_frac=1.0)
    cfg = CodecConfig(block_len=512, predictors=(DOUBLE_DELTA,))
    frame = _roundtrip(streams, cfg, stream_ids=ids, cadences=cads)
    assert set(frame.blocks.predictor.tolist()) == {DOUBLE_DELTA}


def test_config3_lpc_shared_tables(rng):
    """Config 3: LPC residuals + shared code tables, data-parallel host."""
    from dctpu.codec.select import fit_lpc_tables

    streams, ids, cads = synth_corpus(16, 2048, seed=11, cumulative_frac=0.6)
    tables = fit_lpc_tables(streams, orders=(2, 3))
    cfg = CodecConfig(block_len=512, predictors=(LPC,), lpc_tables=tables)
    frame = _roundtrip(streams, cfg, stream_ids=ids, cadences=cads)
    assert set(frame.blocks.predictor.tolist()) == {LPC}
    assert read_frame(write_frame(frame)).tables == tables


def test_config4_mixed_cadence_selection(rng):
    """Config 4: mixed cadences with per-block predictor selection."""
    streams, ids, cads = synth_corpus(
        12, 3000, seed=13, mixed_cadence=True, cumulative_frac=0.4
    )
    assert len(set(cads)) == 3  # 1-min / 15-min / hourly
    frame = _roundtrip(streams, CodecConfig(block_len=512),
                       stream_ids=ids, cadences=cads)
    # selection actually varies across blocks
    assert len(set(frame.blocks.predictor.tolist())) >= 2
    got = read_frame(write_frame(frame))
    assert [s.cadence_s for s in got.streams] == cads


def test_config5_sharded_ordered_gather_bit_exact(rng):
    """Config 5 (scaled): many streams sharded over the device mesh,
    broadcast tables, ordered gather, bit-exact vs the scalar reference."""
    streams, ids, cads = synth_corpus(
        64, 700, seed=17, mixed_cadence=True, cumulative_frac=0.3
    )
    cfg = CodecConfig(block_len=256)
    mesh = make_mesh()
    frame = compress_sharded(streams, cfg, mesh, stream_ids=ids, cadences=cads)
    data = write_frame(frame)
    # ordered gather => byte-identical to the scalar reference serial encode
    assert data == write_frame(
        scalar.scalar_compress(streams, cfg, stream_ids=ids, cadences=cads)
    )
    out = decompress_sharded(read_frame(data), mesh)
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)

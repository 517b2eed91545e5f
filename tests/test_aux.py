"""Auxiliary subsystems: corpus-fit tables, resume manifests, metrics."""

import json

import numpy as np

from dctpu.codec import scalar
from dctpu.codec.select import fit_lpc_table, fit_lpc_tables
from dctpu.config import CodecConfig
from dctpu.constants import LPC
from dctpu.corpus import synth_corpus
from dctpu.format import read_frame, write_frame
from dctpu.utils.metrics import RunMetrics
from dctpu.utils.resume import EncodeJob


def test_fit_lpc_recovers_linear_process(rng):
    # x_t = 1.5 x_{t-1} - 0.5 x_{t-2} + noise -> fitted coeffs close to that
    n = 20000
    x = np.zeros(n)
    eps = rng.normal(0, 1.0, n)
    for t in range(2, n):
        x[t] = 1.5 * x[t - 1] - 0.5 * x[t - 2] + eps[t]
    table = fit_lpc_table([x.astype(np.int32) + 10000], order=2)
    c = np.array(table.coeffs[:2]) / 65536.0
    # the process has a unit root (1-1.5z+0.5z^2 = (1-z)(1-0.5z)); OLS must
    # capture it: coefficients sum to ~1 with a positive first tap > 1
    assert abs(c.sum() - 1.0) < 0.05
    assert 1.1 < c[0] < 1.7


def test_fitted_tables_roundtrip(rng):
    streams, _, _ = synth_corpus(4, 3000, seed=9, cumulative_frac=0.5)
    tables = fit_lpc_tables(streams, orders=(2, 3))
    cfg = CodecConfig(block_len=512, lpc_tables=tables)
    frame = scalar.scalar_compress(streams, cfg)
    frame2 = read_frame(write_frame(frame))
    assert frame2.tables == tables  # tables travel in the frame
    out = scalar.scalar_decompress(frame2)
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)


def test_resume_job(tmp_path, rng):
    streams, ids, cads = synth_corpus(6, 1500, seed=44)
    job = EncodeJob(tmp_path / "job", CodecConfig(block_len=256))
    job.encode_part("0", streams[:3], ids[:3], cads[:3])
    assert job.done("0")

    # simulate restart: new job object sees the manifest, skips part 0
    job2 = EncodeJob(tmp_path / "job", CodecConfig(block_len=256))
    assert job2.done("0")
    job2.encode_part("1", streams[3:], ids[3:], cads[3:])
    out = job2.merge(tmp_path / "merged.dcf")

    from dctpu.codec import decompress

    dec = decompress(read_frame(out.read_bytes()))
    for a, b in zip(streams, dec):
        assert np.array_equal(a, b)


def test_run_metrics_json(rng):
    streams, _, _ = synth_corpus(3, 1000, seed=2)
    frame = scalar.scalar_compress(streams, CodecConfig(block_len=256))
    m = RunMetrics.from_frame(frame, "encode", 0.5, len(write_frame(frame)))
    d = json.loads(m.to_json())
    assert d["mode"] == "encode"
    assert d["ratio"] > 1
    assert sum(d["predictor_histogram"].values()) == frame.blocks.num_blocks


def test_with_retry():
    from dctpu.utils.resume import with_retry

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("transient")
        return "ok"

    assert with_retry(flaky) == "ok"
    assert len(calls) == 2

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        with_retry(lambda: (_ for _ in ()).throw(RuntimeError("always")), attempts=2)


def test_failing_shard_recovers(tmp_path, rng, monkeypatch):
    """Failure detection against a real failing shard (round-2 VERDICT §5
    partial): the first encode attempt of a part dies mid-flight; the job's
    with_retry re-encodes it and the merged frame is byte-identical to a
    clean run."""
    import dctpu.codec as _codec
    from dctpu.codec import compress as real_compress

    streams, ids, cads = synth_corpus(4, 1200, seed=45)
    cfg = CodecConfig(block_len=256)

    fails = {"left": 1}
    def dying_compress(*a, **kw):
        if fails["left"]:
            fails["left"] -= 1
            raise RuntimeError("injected device failure")
        return real_compress(*a, **kw)

    monkeypatch.setattr(_codec, "compress", dying_compress)
    job = EncodeJob(tmp_path / "job", cfg)
    job.encode_part("0", streams[:2], ids[:2], cads[:2])  # survives via retry
    job.encode_part("1", streams[2:], ids[2:], cads[2:])
    out = job.merge(tmp_path / "merged.dcf")
    assert fails["left"] == 0  # the failure really happened

    monkeypatch.setattr(_codec, "compress", real_compress)
    clean = EncodeJob(tmp_path / "clean", cfg)
    clean.encode_part("0", streams[:2], ids[:2], cads[:2])
    clean.encode_part("1", streams[2:], ids[2:], cads[2:])
    ref = clean.merge(tmp_path / "clean.dcf")
    assert out.read_bytes() == ref.read_bytes()

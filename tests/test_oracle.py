"""Cross-implementation tests: C++ oracle vs scalar reference, byte-for-byte.

SURVEY.md §4 "Oracle" tier. The oracle binary is built on demand via make.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from dctpu.codec import scalar_compress, scalar_decompress
from dctpu.config import CodecConfig
from dctpu.corpus import synth_corpus
from dctpu.format import read_frame, read_raw, write_frame, write_raw
from tests.conftest import stream_cases

REPO = Path(__file__).resolve().parent.parent
ORACLE = REPO / "oracle" / "dcomp_oracle"


@pytest.fixture(scope="session")
def oracle_bin():
    subprocess.run(["make", "-C", str(REPO / "oracle")], check=True, capture_output=True)
    assert ORACLE.exists()
    return str(ORACLE)


def _cross_check(tmp_path, oracle_bin, streams, ids=None, cads=None, extra_args=()):
    ids = ids if ids is not None else list(range(len(streams)))
    cads = cads if cads is not None else [900] * len(streams)
    dcr = tmp_path / "in.dcr"
    dcr.write_bytes(write_raw(streams, ids, cads))
    dcf = tmp_path / "oracle.dcf"
    subprocess.run([oracle_bin, "encode", str(dcr), str(dcf), *extra_args],
                   check=True, capture_output=True)
    oracle_bytes = dcf.read_bytes()

    cfg = CodecConfig()
    py_bytes = write_frame(scalar_compress(streams, cfg, stream_ids=ids, cadences=cads))
    assert py_bytes == oracle_bytes, "oracle and scalar reference frames differ"

    # oracle decodes the python frame
    out_dcr = tmp_path / "out.dcr"
    subprocess.run([oracle_bin, "decode", str(dcf), str(out_dcr)],
                   check=True, capture_output=True)
    out, oids, _ = read_raw(out_dcr.read_bytes())
    assert oids == list(ids)
    for a, b in zip(streams, out):
        assert np.array_equal(a, b)

    # python decodes the oracle frame
    out2 = scalar_decompress(read_frame(oracle_bytes))
    for a, b in zip(streams, out2):
        assert np.array_equal(a, b)


def test_oracle_matches_reference_on_corpus(tmp_path, oracle_bin):
    streams, ids, cads = synth_corpus(
        6, 3000, seed=21, mixed_cadence=True, cumulative_frac=0.4
    )
    _cross_check(tmp_path, oracle_bin, streams, ids, cads)


def test_oracle_matches_reference_on_adversarial(tmp_path, oracle_bin, rng):
    streams = stream_cases(rng)
    # drop the empty-adjacent cases into the mix too
    streams.append(np.zeros(0, dtype=np.int32))
    _cross_check(tmp_path, oracle_bin, streams)


def test_oracle_verify_mode(tmp_path, oracle_bin, rng):
    streams = stream_cases(rng)[:4]
    dcr = tmp_path / "v.dcr"
    dcr.write_bytes(write_raw(streams))
    r = subprocess.run([oracle_bin, "verify", str(dcr)], capture_output=True, text=True)
    assert r.returncode == 0
    assert "OK" in r.stderr

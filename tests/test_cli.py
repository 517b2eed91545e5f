"""CLI driver round trips (SURVEY.md §2.1 "CLI driver", §3 E1/E2/E4).

Exercises the same file-in/file-out surface as the reference C codec's CLI:
encode DCR1 -> DCF1, decode back, verify mode, and bare-int32 input.
"""

import sys

import numpy as np
import pytest

from dctpu.cli.main import main as cli_main
from dctpu.corpus import synth_corpus
from dctpu.format import read_raw, write_raw


@pytest.fixture()
def corpus_file(tmp_path):
    streams, ids, cads = synth_corpus(3, 900, seed=21, mixed_cadence=True)
    p = tmp_path / "in.dcr"
    p.write_bytes(write_raw(streams, ids, cads))
    return p, streams, ids, cads


@pytest.mark.parametrize("coder", ["rice", "vertical", "adaptive"])
def test_cli_encode_decode_roundtrip(tmp_path, corpus_file, coder):
    p, streams, ids, cads = corpus_file
    out_f = tmp_path / "out.dcf"
    back_f = tmp_path / "back.dcr"
    rc = cli_main(
        ["encode", str(p), str(out_f), "--block-len", "512", "--coder", coder]
    )
    assert rc == 0 and out_f.exists()
    rc = cli_main(["decode", str(out_f), str(back_f)])
    assert rc == 0
    rs, rids, rcads = read_raw(back_f.read_bytes())
    assert rids == list(ids) and rcads == list(cads)
    assert all(np.array_equal(a, b) for a, b in zip(streams, rs))
    # compressed output actually compresses
    raw = sum(s.nbytes for s in streams)
    assert out_f.stat().st_size < raw


def test_cli_verify_ok(corpus_file):
    p, *_ = corpus_file
    assert cli_main(["verify", str(p), "--block-len", "512"]) == 0


def test_cli_bare_int32_input(tmp_path):
    x = (np.arange(2000, dtype=np.int32) * 7 + 3).astype("<i4")
    p = tmp_path / "bare.bin"
    p.write_bytes(x.tobytes())
    out_f = tmp_path / "out.dcf"
    back_f = tmp_path / "back.dcr"
    assert cli_main(["encode", str(p), str(out_f), "--block-len", "512"]) == 0
    assert cli_main(["decode", str(out_f), str(back_f)]) == 0
    rs, _, _ = read_raw(back_f.read_bytes())
    assert np.array_equal(rs[0], x)


def test_cli_predictor_subset(tmp_path, corpus_file):
    p, streams, _, _ = corpus_file
    out_f = tmp_path / "out.dcf"
    rc = cli_main(
        ["encode", str(p), str(out_f), "--block-len", "512",
         "--predictors", "delta", "--coder", "rice"]
    )
    assert rc == 0
    back_f = tmp_path / "b.dcr"
    assert cli_main(["decode", str(out_f), str(back_f)]) == 0
    rs, _, _ = read_raw(back_f.read_bytes())
    assert all(np.array_equal(a, b) for a, b in zip(streams, rs))


def test_cli_fit_tables_roundtrip(tmp_path):
    """--fit-tables: corpus-fit LPC tables serialize into the frame and the
    round trip stays bit-exact (decoder reads tables from the frame)."""
    import numpy as np

    from dctpu.cli.main import main
    from dctpu.corpus import synth_corpus
    from dctpu.format import read_raw, write_raw

    streams, ids, cads = synth_corpus(4, 2000, seed=9, mixed_cadence=True)
    src = tmp_path / "in.dcr"
    src.write_bytes(write_raw(streams, ids, cads))
    enc = tmp_path / "out.dcf"
    dec = tmp_path / "back.dcr"
    assert main(["encode", str(src), str(enc), "--block-len", "256",
                 "--fit-tables"]) == 0
    assert main(["decode", str(enc), str(dec)]) == 0
    back, bids, _ = read_raw(dec.read_bytes())
    assert bids == list(ids)
    for a, b in zip(streams, back):
        assert np.array_equal(a, b)
    # fitted tables really differ from the builtins in the written frame
    from dctpu.config import DEFAULT_LPC_TABLES
    from dctpu.format import read_frame

    fr = read_frame(enc.read_bytes())
    assert tuple(fr.tables) != DEFAULT_LPC_TABLES

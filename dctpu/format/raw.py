"""DCR1 raw corpus container (docs/FORMAT.md §6): tool interchange format.

Hands corpora to the C++ oracle and back; not part of the compressed format.
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

import numpy as np

from dctpu.constants import RAW_MAGIC

_ENTRY = struct.Struct("<QIIQ")  # stream_id, cadence_s, reserved, num_samples


def write_raw(
    streams: Sequence[np.ndarray],
    stream_ids: Sequence[int] | None = None,
    cadences: Sequence[int] | None = None,
) -> bytes:
    n = len(streams)
    stream_ids = stream_ids if stream_ids is not None else list(range(n))
    cadences = cadences if cadences is not None else [900] * n  # 15-min default
    out = [RAW_MAGIC, struct.pack("<I", n)]
    for sid, cad, s in zip(stream_ids, cadences, streams):
        s = np.asarray(s, dtype=np.int32)
        if s.ndim != 1:
            raise ValueError("streams must be 1-D int32 arrays")
        out.append(_ENTRY.pack(int(sid), int(cad), 0, s.size))
    for s in streams:
        out.append(np.asarray(s, dtype="<i4").tobytes())
    return b"".join(out)


def read_raw(data: bytes) -> Tuple[List[np.ndarray], List[int], List[int]]:
    if data[:4] != RAW_MAGIC:
        raise ValueError("bad DCR1 magic")
    (n,) = struct.unpack_from("<I", data, 4)
    ids, cads, lens = [], [], []
    off = 8
    for _ in range(n):
        sid, cad, _res, ns = _ENTRY.unpack_from(data, off)
        ids.append(sid)
        cads.append(cad)
        lens.append(ns)
        off += _ENTRY.size
    streams = []
    for ns in lens:
        streams.append(np.frombuffer(data, dtype="<i4", count=ns, offset=off).copy())
        off += 4 * ns
    return streams, ids, cads

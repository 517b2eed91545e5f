"""Checkpoint/resume for long encode jobs (SURVEY.md §5).

No optimizer state exists in a codec; resumability is at stream granularity
(the reference codec family's signature property, first-class in the DCF1
frame: every block decodes independently). A job writes per-shard part files
plus a manifest of completed stream ids; on restart, finished work is skipped
and the parts are concatenated into the final frame.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def with_retry(fn, attempts: int = 2, on_error=None):
    """Failure-detection wrapper (SURVEY.md §5): re-run a failed shard once.

    The frame format makes re-encoding any stream shard independent work, so
    recovery is just retrying the part; no distributed state to repair.
    """
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — deliberate blanket retry
            last = e
            if on_error is not None:
                on_error(i, e)
    raise last


class EncodeJob:
    """Resumable chunked encode: streams -> part frames -> one merged frame."""

    def __init__(self, workdir: str | Path, cfg=None):
        from dctpu.config import CodecConfig

        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg or CodecConfig()
        self.manifest_path = self.workdir / "manifest.json"
        self.manifest: Dict[str, str] = {}
        if self.manifest_path.exists():
            self.manifest = json.loads(self.manifest_path.read_text())

    def done(self, part_id: str) -> bool:
        return part_id in self.manifest

    def encode_part(
        self,
        part_id: str,
        streams: Sequence[np.ndarray],
        stream_ids: Sequence[int] | None = None,
        cadences: Sequence[int] | None = None,
        attempts: int = 2,
    ) -> Path:
        """Encode one part (skipped if already in the manifest).

        Failure detection (SURVEY.md §5): the encode of a part is retried
        `attempts` times via with_retry — parts are independent work, so a
        transient device/worker failure costs one part re-encode, nothing
        distributed to repair.
        """
        import dctpu.codec as _codec
        from dctpu.format import write_frame

        path = self.workdir / f"part-{part_id}.dcf"
        if self.done(part_id) and path.exists():
            return path
        frame = with_retry(
            lambda: _codec.compress(
                streams, self.cfg, stream_ids=stream_ids, cadences=cadences
            ),
            attempts=attempts,
        )
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(write_frame(frame))
        os.replace(tmp, path)  # atomic: a part is either absent or complete
        self.manifest[part_id] = path.name
        tmp_manifest = self.manifest_path.with_suffix(".tmp")
        tmp_manifest.write_text(json.dumps(self.manifest, indent=0))
        os.replace(tmp_manifest, self.manifest_path)
        return path

    def merge(self, out_path: str | Path) -> Path:
        """Concatenate completed parts into one frame (stream order = part
        insertion order, then within-part order)."""
        from dctpu.format import read_frame, write_frame
        from dctpu.format.frame import BlockHeaders, Frame

        frames = [
            read_frame((self.workdir / name).read_bytes())
            for name in self.manifest.values()
        ]
        if not frames:
            raise ValueError("no completed parts to merge")
        L = frames[0].block_len
        tables = frames[0].tables
        for f in frames:
            if f.block_len != L or f.tables != tables:
                raise ValueError("parts disagree on block_len/tables")

        streams, parts_blocks, payloads = [], [], []
        first_block = 0
        for f in frames:
            for s in f.streams:
                s.first_block += first_block
                streams.append(s)
            parts_blocks.append(f.blocks)
            payloads.append(f.payload_words)
            first_block += f.blocks.num_blocks

        def cat(field):
            return np.concatenate([getattr(b, field) for b in parts_blocks])

        blocks = BlockHeaders(
            predictor=cat("predictor"),
            k=cat("k"),
            n=cat("n"),
            bit_len=cat("bit_len"),
            table_idx=cat("table_idx"),
            history=np.concatenate([b.history for b in parts_blocks]),
            coder=np.concatenate([b.coder_arr() for b in parts_blocks]),
        )
        merged = Frame(
            block_len=L,
            streams=streams,
            blocks=blocks,
            tables=tables,
            payload_words=np.concatenate(payloads),
        )
        out_path = Path(out_path)
        out_path.write_bytes(write_frame(merged))
        return out_path

"""Host-side ragged layout transforms for the VERTICAL coder.

Round 4: the device payload layout is PACKED (each sub's REGION_PAD slot
holds its live disk words verbatim — kernels/vertical_xla.py REGION_PAD
note), so these transforms are pure segmented word copies between the
REGION_PAD-strided rows and the canonical disk stream (FORMAT §2.2). The
native OpenMP path (native/host_transforms.cpp) does per-sub memcpy; the
numpy fallback is one flat fancy-index pass.

  compact_vertical: packed payload rows -> canonical disk words
  stage_vertical:   canonical disk words -> packed payload rows
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from dctpu.constants import sub_caps, subs_per_block, sync_words
from dctpu.kernels.vertical_xla import REGION_PAD


def _parse_sync_rows(
    sync_rows: np.ndarray, subs: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[B, SW] u32 -> (b [B, S], n_exc [B, S], vw [B, S] value words)."""
    u16 = np.ascontiguousarray(sync_rows, dtype="<u4").view("<u2").reshape(
        sync_rows.shape[0], -1
    )[:, :subs]
    entries = u16.astype(np.int64)
    b = (entries & 0x3F).astype(np.int64)
    n_exc = ((entries >> 6) & 0x1F).astype(np.int64)
    e = ((entries >> 11) & 0x1F) + 1  # valid only where n_exc > 0
    vw = np.where(n_exc > 0, np.minimum(n_exc, (e + 1) // 2), 0).astype(np.int64)
    return b, n_exc, vw


def _flat_map(b: np.ndarray, n_exc: np.ndarray, vw: np.ndarray, block_len: int):
    """Per-sub live word counts + flat (block, sub, word) index arrays."""
    B, S = b.shape
    pw = np.array([(c + 31) // 32 for c in sub_caps(block_len)], dtype=np.int64)
    wc_sub = pw[None, :] * b + (n_exc + 3) // 4 + vw  # [B, S]

    flat_counts = wc_sub.reshape(-1)
    T = int(flat_counts.sum())
    seg_off = np.zeros(flat_counts.size + 1, dtype=np.int64)
    np.cumsum(flat_counts, out=seg_off[1:])
    seg_id = np.repeat(np.arange(flat_counts.size, dtype=np.int64), flat_counts)
    w_local = np.arange(T, dtype=np.int64) - seg_off[seg_id]
    bi, si = seg_id // S, seg_id % S
    return wc_sub, seg_off, bi, si, w_local


def compact_vertical(payload: np.ndarray, block_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Packed payload rows [B, W] -> (disk words, per-block word counts)."""
    from dctpu import native

    fast = native.vert_compact(payload, block_len)
    if fast is not None:
        return fast

    B = payload.shape[0]
    S = subs_per_block(block_len)
    SW = sync_words(block_len)
    b, n_exc, vw = _parse_sync_rows(payload[:, :SW], S)
    wc_sub, seg_off, bi, si, w_local = _flat_map(b, n_exc, vw, block_len)

    wc_block = SW + wc_sub.sum(axis=1)  # [B]
    block_off = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(wc_block, out=block_off[1:])
    out = np.zeros(int(block_off[-1]), dtype=np.uint32)

    # sync words
    sync_dst = block_off[:B, None] + np.arange(SW, dtype=np.int64)[None, :]
    out[sync_dst.reshape(-1)] = payload[:, :SW].reshape(-1)

    # sub words: live prefix of each REGION_PAD slot, in order
    block_seg0 = seg_off[np.arange(B, dtype=np.int64) * S]
    within_block = np.arange(w_local.size, dtype=np.int64) - block_seg0[bi]
    dst = block_off[bi] + SW + within_block
    W = payload.shape[1]
    src = payload.reshape(-1)[bi * W + SW + si * REGION_PAD + w_local]
    out[dst] = src
    return out, wc_block


def stage_vertical(
    disk_words: np.ndarray,
    word_off: np.ndarray,  # [B+1] per-block disk word offsets
    block_len: int,
) -> np.ndarray:
    """Canonical disk words -> packed payload rows [B, SW + S*REGION_PAD]."""
    B = word_off.size - 1
    S = subs_per_block(block_len)
    SW = sync_words(block_len)
    W = SW + S * REGION_PAD

    from dctpu import native

    fast = native.vert_stage(disk_words, word_off, block_len, W)
    if fast is not None:
        return fast

    out = np.zeros((B, W), dtype=np.uint32)
    if B == 0:
        return out

    sync_src = word_off[:B, None] + np.arange(SW, dtype=np.int64)[None, :]
    out[:, :SW] = disk_words[sync_src]

    b, n_exc, vw = _parse_sync_rows(out[:, :SW], S)
    wc_sub, seg_off, bi, si, w_local = _flat_map(b, n_exc, vw, block_len)

    block_seg0 = seg_off[np.arange(B, dtype=np.int64) * S]
    within_block = np.arange(w_local.size, dtype=np.int64) - block_seg0[bi]
    src = disk_words[word_off[bi] + SW + within_block]
    out.reshape(-1)[bi * W + SW + si * REGION_PAD + w_local] = src
    return out


def max_plane_width(staged_rows: np.ndarray, block_len: int) -> int:
    """Max sub-block width b in a staged batch (from the sync tables)."""
    S = subs_per_block(block_len)
    b, _, _ = _parse_sync_rows(staged_rows[:, : sync_words(block_len)], S)
    return int(b.max()) if b.size else 0

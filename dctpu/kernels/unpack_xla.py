"""Pure-XLA bit unpacker: dense u32 words -> zigzag values, lane-parallel.

Replaces the reference's serial get_bits loop (SURVEY.md §3 decode hot loop).
Variable-length decode is sequential only within a 128-sample sub-block: the
payload's sync table (docs/FORMAT.md §2.1) gives every sub-block's starting
bit offset up front, so the scan runs SUB_BLOCK=128 steps with B*SUBS lanes
active per step (32x wider and 32x shorter than a block-serial scan at
block_len=4096). Bit-window extraction is uint32 funnel shifts; trailing-ones
counting is popcount-based.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dctpu.constants import (
    ESCAPE_Q,
    MAX_CODE_BITS,
    RAW_BITS,
    SUB_BLOCK,
    subs_per_block,
    sync_words,
)


def _funnel(lo: jnp.ndarray, hi: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """32-bit window starting s bits into lo: (lo >> s) | (hi << (32-s))."""
    hi_part = jnp.where(
        s == 0, jnp.uint32(0), hi << ((jnp.uint32(32) - s) & jnp.uint32(31))
    )
    return (lo >> s) | hi_part


def _trailing_ones(w: jnp.ndarray) -> jnp.ndarray:
    """Number of consecutive 1-bits from bit 0. All-ones -> 32."""
    lowest_zero = (~w) & (w + jnp.uint32(1))
    return jax.lax.population_count(lowest_zero - jnp.uint32(1)).astype(jnp.int32)


def read_sync_table(payload: jnp.ndarray, block_len: int) -> jnp.ndarray:
    """[B, Wp] payload rows -> [B, SUBS] sub-block bit lengths (i32)."""
    SW = sync_words(block_len)
    subs = subs_per_block(block_len)
    words = payload[:, :SW]
    lo = (words & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (words >> jnp.uint32(16)).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=2).reshape(payload.shape[0], -1)[:, :subs]


def unpack_xla(
    payload: jnp.ndarray,  # [B, Wp] u32, padded with >=2 trailing words per row
    k: jnp.ndarray,        # [B] i32/u8
    n: jnp.ndarray,        # [B] i32 valid samples
    block_len: int,
) -> jnp.ndarray:
    """Returns z [B, L] uint32 (zeros past n)."""
    B, Wp = payload.shape
    L = block_len
    SW = sync_words(L)
    subs = subs_per_block(L)
    T = min(SUB_BLOCK, L)

    sub_lens = read_sync_table(payload, L)  # [B, SUBS]
    sub_off = jnp.cumsum(sub_lens, axis=1) - sub_lens + SW * 32  # [B, SUBS]

    # Valid samples per sub-block (static caps, dynamic n).
    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK  # [SUBS]
    cap = jnp.minimum(jnp.int32(T), jnp.int32(L) - sub_start)  # [SUBS]
    n_sub = jnp.clip(n[:, None] - sub_start[None, :], 0, cap[None, :])  # [B, SUBS]

    ku = k.astype(jnp.uint32)[:, None]
    kmask = (jnp.uint32(1) << ku) - jnp.uint32(1)
    ki = k.astype(jnp.int32)[:, None]

    def step(p, t):
        # p: [B, SUBS] current bit position per lane
        j = p >> 5
        s = (p & 31).astype(jnp.uint32)
        w0 = jnp.take_along_axis(payload, jnp.minimum(j, Wp - 1), axis=1)
        w1 = jnp.take_along_axis(payload, jnp.minimum(j + 1, Wp - 1), axis=1)
        w2 = jnp.take_along_axis(payload, jnp.minimum(j + 2, Wp - 1), axis=1)
        win_lo = _funnel(w0, w1, s)
        win_hi = _funnel(w1, w2, s)

        ones = _trailing_ones(win_lo)
        esc = ones >= ESCAPE_Q
        q = jnp.minimum(ones, ESCAPE_Q - 1).astype(jnp.uint32)

        v = (win_lo >> (q + jnp.uint32(1))) | (win_hi << (jnp.uint32(31) - q))
        z_norm = (q << ku) | (v & kmask)
        z_esc = (win_lo >> jnp.uint32(ESCAPE_Q)) | (
            win_hi << jnp.uint32(RAW_BITS - ESCAPE_Q)
        )
        z = jnp.where(esc, z_esc, z_norm)

        length = jnp.where(esc, MAX_CODE_BITS, q.astype(jnp.int32) + 1 + ki)
        active = t < n_sub
        z = jnp.where(active, z, jnp.uint32(0))
        p = p + jnp.where(active, length, 0)
        return p, z

    _, zs = jax.lax.scan(step, sub_off, jnp.arange(T, dtype=jnp.int32))
    z = jnp.moveaxis(zs, 0, 2)  # [B, SUBS, T]

    if subs == 1:
        return z[:, 0, :L]
    # all subs have cap T except possibly the last
    last_cap = L - SUB_BLOCK * (subs - 1)
    body = z[:, :-1, :].reshape(B, -1)
    tail = z[:, -1, :last_cap]
    return jnp.concatenate([body, tail], axis=1)

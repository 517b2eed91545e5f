"""Pure-XLA bit unpacker: dense u32 words -> zigzag values, per block.

Replaces the reference's serial get_bits loop (SURVEY.md §3 decode hot loop).
Variable-length decode is inherently sequential WITHIN a block (the position of
codeword t depends on the lengths of 0..t-1), so the design parallelizes ACROSS
blocks: one lax.scan over the sample axis whose every step operates on the
whole [B] batch of blocks at once. Bit-window extraction uses only uint32
funnel shifts; trailing-ones counting is popcount-based (no ctz needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dctpu.constants import ESCAPE_Q, MAX_CODE_BITS, RAW_BITS


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


def unpack_xla(
    payload: jnp.ndarray,  # [B, Wp] u32, padded with >=2 trailing words per row
    k: jnp.ndarray,        # [B] i32/u8
    n: jnp.ndarray,        # [B] i32 valid samples
    block_len: int,
) -> jnp.ndarray:
    """Returns z [B, L] uint32 (zeros past n)."""
    B, Wp = payload.shape
    ku = k.astype(jnp.uint32)
    kmask = (jnp.uint32(1) << ku) - jnp.uint32(1)
    rows = jnp.arange(B, dtype=jnp.int32)

    def step(p, t):
        # p: [B] current bit position per block
        j = p >> 5
        s = (p & 31).astype(jnp.uint32)
        w0 = payload[rows, jnp.minimum(j, Wp - 1)]
        w1 = payload[rows, jnp.minimum(j + 1, Wp - 1)]
        w2 = payload[rows, jnp.minimum(j + 2, Wp - 1)]
        win_lo = _funnel(w0, w1, s)
        win_hi = _funnel(w1, w2, s)

        ones = _trailing_ones(win_lo)
        esc = ones >= ESCAPE_Q
        q = jnp.minimum(ones, ESCAPE_Q - 1).astype(jnp.uint32)

        v = (win_lo >> (q + jnp.uint32(1))) | (win_hi << (jnp.uint32(31) - q))
        z_norm = (q << ku) | (v & kmask)
        z_esc = (win_lo >> jnp.uint32(ESCAPE_Q)) | (win_hi << jnp.uint32(RAW_BITS - ESCAPE_Q))
        z = jnp.where(esc, z_esc, z_norm)

        length = jnp.where(
            esc, MAX_CODE_BITS, q.astype(jnp.int32) + 1 + k.astype(jnp.int32)
        )
        active = t < n
        z = jnp.where(active, z, jnp.uint32(0))
        p = p + jnp.where(active, length, 0)
        return p, z

    p0 = jnp.zeros(B, dtype=jnp.int32)
    _, zs = jax.lax.scan(step, p0, jnp.arange(block_len, dtype=jnp.int32))
    return zs.T  # [B, L]

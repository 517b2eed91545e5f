"""Pure-XLA bit packer: variable-length codewords -> dense u32 words.

Replaces the reference's serial put_bits loop (SURVEY.md §3 encode hot loop)
with the parallel-entropy-coding pattern mandated by the north star [B:5]:

  1. exclusive prefix sum of codeword bit lengths -> every sample knows its
     absolute output bit offset (no serial dependency),
  2. each codeword is split into <=3 aligned u32 contributions (a 48-bit max
     code starting at any bit offset spans at most 3 words),
  3. contributions from different codewords occupy disjoint bit ranges, so a
     scatter-ADD over the payload words is exactly a scatter-OR.

All shifts are uint32 with explicit s==0 guards (no 64-bit ops on the TPU hot
path). Fixed-shape output: W = ceil(L*48/32) words per block (XLA needs static
shapes); compaction to actual sizes happens at frame assembly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from dctpu.constants import MAX_CODE_BITS


def padded_words(block_len: int) -> int:
    """Worst-case payload words per block (every sample an escape code)."""
    return (block_len * MAX_CODE_BITS + 31) // 32


def _shr_funnel(lo: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """lo >> (32 - s) with the s == 0 case mapped to 0 (avoids UB shift-by-32)."""
    return jnp.where(
        s == 0, jnp.uint32(0), lo >> ((jnp.uint32(32) - s) & jnp.uint32(31))
    )


def pack_xla(
    code_lo: jnp.ndarray,  # [B, L] u32
    code_hi: jnp.ndarray,  # [B, L] u32 (bits 32.. of each codeword)
    length: jnp.ndarray,   # [B, L] i32 (0 for invalid samples)
    valid: jnp.ndarray,    # [B, L] bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (payload [B, W] u32, bit_len [B] i32)."""
    B, L = code_lo.shape
    W = padded_words(L)

    length = jnp.where(valid, length, 0)
    code_lo = jnp.where(valid, code_lo, jnp.uint32(0))
    code_hi = jnp.where(valid, code_hi, jnp.uint32(0))

    # Exclusive scan of lengths -> absolute bit offsets; total bits per block.
    incl = jnp.cumsum(length, axis=1)
    off = incl - length
    bit_len = incl[:, -1]

    s = (off & 31).astype(jnp.uint32)
    w = off >> 5  # word index within block

    # Codeword shifted to its bit offset, expressed as 3 word contributions.
    v0 = code_lo << s
    v1 = _shr_funnel(code_lo, s) | (code_hi << s)
    v2 = _shr_funnel(code_hi, s)

    flat_idx = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * W + w
    )  # [B, L] word index in flattened payload
    payload = jnp.zeros(B * W, dtype=jnp.uint32)
    # Disjoint bit ranges -> add == or. OOB (zero-valued) contributions drop.
    payload = payload.at[flat_idx].add(v0, mode="drop")
    payload = payload.at[flat_idx + 1].add(v1, mode="drop")
    payload = payload.at[flat_idx + 2].add(v2, mode="drop")
    return payload.reshape(B, W), bit_len

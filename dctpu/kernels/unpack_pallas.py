"""Pallas TPU bit unpacker: one grid program per block, VMEM-resident.

Counterpart of pack_pallas: reads the sub-block sync table, prefix-sums it to
the per-sub bit offsets (the format's parallel-decode hook), then decodes each
sub-block's codewords with scalar bit-window reads against the VMEM-resident
payload row. Interface-identical to unpack_xla; cross-tested bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import (
    ESCAPE_Q,
    MAX_CODE_BITS,
    RAW_BITS,
    SUB_BLOCK,
    subs_per_block,
    sync_words,
)
from dctpu.kernels.pack_xla import padded_words


ROWS = 8  # blocks per grid program (TPU sublane tiling requires 8)


def _unpack_kernel(payload_ref, k_ref, n_ref, z_ref, *, block_len):
    L = block_len
    SW = sync_words(L)
    subs = subs_per_block(L)

    z_ref[:, :] = jnp.zeros_like(z_ref[:, :])

    def row(r, _):
        k = k_ref[r].astype(jnp.uint32)
        n = n_ref[r]
        kmask = (jnp.uint32(1) << k) - jnp.uint32(1)

        def win32(p):
            j = p >> 5
            s = (p & 31).astype(jnp.uint32)
            w0 = payload_ref[r, j]
            w1 = payload_ref[r, j + 1]
            sh = (jnp.uint32(32) - s) & jnp.uint32(31)
            return (w0 >> s) | jnp.where(s == 0, jnp.uint32(0), w1 << sh)

        def sub_bits(si):
            word = payload_ref[r, si >> 1]
            return jnp.where(
                si % 2 == 0, word & jnp.uint32(0xFFFF), word >> jnp.uint32(16)
            ).astype(jnp.int32)

        def decode_sub(si, bit_base):
            start = si * SUB_BLOCK

            def step(t, p):
                idx = start + t

                def live(p):
                    wlo = win32(p)
                    whi = win32(p + 32)
                    lowest_zero = (~wlo) & (wlo + jnp.uint32(1))
                    ones = jax.lax.population_count(
                        lowest_zero - jnp.uint32(1)
                    ).astype(jnp.int32)
                    esc = ones >= ESCAPE_Q
                    q = jnp.minimum(ones, ESCAPE_Q - 1).astype(jnp.uint32)
                    v = (wlo >> (q + jnp.uint32(1))) | (
                        whi << (jnp.uint32(31) - q)
                    )
                    z_norm = (q << k) | (v & kmask)
                    z_esc = (wlo >> jnp.uint32(ESCAPE_Q)) | (
                        whi << jnp.uint32(RAW_BITS - ESCAPE_Q)
                    )
                    zv = jnp.where(esc, z_esc, z_norm)
                    ln = jnp.where(
                        esc,
                        MAX_CODE_BITS,
                        q.astype(jnp.int32) + 1 + k.astype(jnp.int32),
                    )
                    z_ref[r, idx] = zv
                    return p + ln

                return jax.lax.cond(idx < n, live, lambda p: p, p)

            cap = jnp.minimum(jnp.int32(SUB_BLOCK), jnp.int32(L) - start)
            jax.lax.fori_loop(0, cap, step, bit_base)
            return bit_base + sub_bits(si)

        jax.lax.fori_loop(0, subs, decode_sub, jnp.int32(SW * 32))
        return 0

    jax.lax.fori_loop(0, ROWS, row, 0)


def unpack_pallas(
    payload: jnp.ndarray,  # [B, Wp] u32 (>= 2 trailing pad words)
    k: jnp.ndarray,
    n: jnp.ndarray,
    block_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Wp = payload.shape
    need = padded_words(block_len) + 2
    if Wp < need:
        payload = jnp.pad(payload, ((0, 0), (0, need - Wp)))
        Wp = need
    Bp = (B + ROWS - 1) // ROWS * ROWS
    if Bp != B:
        payload = jnp.pad(payload, ((0, Bp - B), (0, 0)))
        k = jnp.pad(k, (0, Bp - B))
        n = jnp.pad(n, (0, Bp - B))
    z = pl.pallas_call(
        functools.partial(_unpack_kernel, block_len=block_len),
        grid=(Bp // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, block_len), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, block_len), jnp.uint32),
        interpret=interpret,
    )(payload, k.astype(jnp.int32), n.astype(jnp.int32))
    return z[:B]

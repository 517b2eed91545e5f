"""Pallas TPU bit packer: one grid program per block, VMEM-resident.

The north star's "blockwise Pallas pack/unpack with exclusive-scan bit
offsets" [BASELINE.json:5]: codeword lengths are prefix-summed with a
vectorized in-VMEM scan; the sync table falls out of the same scan; emission
is a sequential scalar loop over the block's samples writing u32 words by
read-modify-OR at dynamic offsets — all against VMEM, with the grid
pipelining blocks through HBM->VMEM DMA.

Interface-identical to pack_xla and cross-tested bit-for-bit (interpret mode
on CPU, compiled on TPU). The XLA path remains the default until this wins on
the target platform (SURVEY.md §7 "Pallas on the axon platform").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import SUB_BLOCK, subs_per_block, sync_words
from dctpu.kernels.pack_xla import padded_words


ROWS = 8  # blocks per grid program (TPU sublane tiling requires 8)


def _inclusive_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Hillis-Steele inclusive scan along axis 1 (Mosaic lacks cumsum)."""
    L = x.shape[1]
    d = 1
    while d < L:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], d), x.dtype), x[:, : L - d]], axis=1
        )
        x = x + shifted
        d *= 2
    return x


def _pack_kernel(code_lo_ref, code_hi_ref, length_ref, payload_ref, *, block_len):
    L = block_len
    SW = sync_words(L)
    subs = subs_per_block(L)

    lengths = length_ref[:, :]                      # [ROWS, L] i32
    incl = _inclusive_scan(lengths)                 # inclusive scan
    off = incl - lengths                            # exclusive scan

    payload_ref[:, :] = jnp.zeros_like(payload_ref[:, :])

    # sync table from the same scan: per-sub totals, u16-packed pairs
    pad = subs * SUB_BLOCK - L
    lens_p = jnp.pad(lengths, ((0, 0), (0, pad))) if pad else lengths
    sub_lens = jnp.sum(
        lens_p.reshape(ROWS, subs, SUB_BLOCK), axis=2, dtype=jnp.int32
    ).astype(jnp.uint32)
    if subs % 2:
        sub_lens = jnp.pad(sub_lens, ((0, 0), (0, 1)))
    pairs = sub_lens.reshape(ROWS, SW, 2)
    payload_ref[:, 0:SW] = pairs[:, :, 0] | (pairs[:, :, 1] << jnp.uint32(16))

    def emit_row(r, _):
        def emit(t, _):
            ln = lengths[r, t]

            @pl.when(ln > 0)
            def _():
                o = off[r, t]
                w = SW + (o >> 5)
                s = (o & 31).astype(jnp.uint32)
                lo = code_lo_ref[r, t]
                hi = code_hi_ref[r, t]
                sh = (jnp.uint32(32) - s) & jnp.uint32(31)
                v0 = lo << s
                v1 = jnp.where(s == 0, jnp.uint32(0), lo >> sh) | (hi << s)
                v2 = jnp.where(s == 0, jnp.uint32(0), hi >> sh)
                payload_ref[r, w] = payload_ref[r, w] | v0
                payload_ref[r, w + 1] = payload_ref[r, w + 1] | v1
                payload_ref[r, w + 2] = payload_ref[r, w + 2] | v2

            return 0

        jax.lax.fori_loop(0, L, emit, 0)
        return 0

    jax.lax.fori_loop(0, ROWS, emit_row, 0)


def pack_pallas(
    code_lo: jnp.ndarray,
    code_hi: jnp.ndarray,
    length: jnp.ndarray,
    valid: jnp.ndarray,
    block_len: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as pack_xla: (payload [B, W], bit_len [B])."""
    import functools

    B, L = code_lo.shape
    W = padded_words(block_len) + 2  # +2 slack words for the 3-word straddle
    length = jnp.where(valid, length, 0)
    code_lo = jnp.where(valid, code_lo, jnp.uint32(0))
    code_hi = jnp.where(valid, code_hi, jnp.uint32(0))

    Bp = (B + ROWS - 1) // ROWS * ROWS
    if Bp != B:
        padw = ((0, Bp - B), (0, 0))
        code_lo = jnp.pad(code_lo, padw)
        code_hi = jnp.pad(code_hi, padw)
        length = jnp.pad(length, padw)

    payload = pl.pallas_call(
        functools.partial(_pack_kernel, block_len=block_len),
        grid=(Bp // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, W), jnp.uint32),
        interpret=interpret,
    )(code_lo, code_hi, length)

    bit_len = jnp.sum(length[:B], axis=1, dtype=jnp.int32)
    return payload[:B, : padded_words(block_len)], bit_len

"""Pallas TPU Rice unpacker: VMEM-resident shift-buffer decode scan.

Same schedule as kernels/unpack_scan.py (one codeword per sub-block per
step; the sub-block's remaining bitstream is scan state shifted down after
every decode), with the state held in VMEM scratch across a sequential TPU
grid instead of round-tripping HBM every `lax.scan` step — the XLA twin
moves state x 2 x 128 steps (~tens of GB at bench geometry) where this
kernel moves input + output once.

Mosaic constraints shaping the implementation (bench/mosaic_probe.py):
  * no dynamic sublane stores -> per-step z rows are written to a
    TIME-MAJOR scratch zbuf[T, R, S] (dynamic index on the untiled major
    axis is a plain address offset) and flushed to the time-major output
    in one dense store at the last grid step;
  * no lane-strided loads -> the sync table is decoded outside the kernel
    (XLA) into per-sub bit offsets / valid counts.

Round-1's kernel needed dynamic-offset scalar loads (interpret-only); this
one is all elementwise funnels, static minor slices, and whole-block
stores, the probed-OK op menu.

Interface-identical to unpack_scan (staged rows from stage_rice_scan /
stage_rice_scan_device) and cross-tested bit-for-bit.

Reference interface parity: SURVEY.md §2.1 "Bit-unpacker (hot)"; replaces
the serial get_bits loop of SURVEY.md §3 (decode hot loop).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import (
    ESCAPE_Q,
    MAX_CODE_BITS,
    SUB_BLOCK,
    subs_per_block,
    sync_words,
)
from dctpu.kernels.unpack_xla import _trailing_ones, read_sync_table

ROWS = 8  # blocks per grid program (TPU sublane tile)

# i32 zero for index maps (bare 0 returns i64 under jax_enable_x64, which
# Mosaic cannot legalize — see pack_pallas)
_I0 = np.int32(0)


def _unpack_kernel(raw_ref, s0_ref, nsub_ref, k_ref, out_ref, buf, zbuf,
                   w0s, w1s, *, UB, T):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # bit-align each sub-block's buffer: bit 0 == first code bit
        raw = raw_ref[:, :, :]
        s0 = s0_ref[:, :].astype(jnp.uint32)[:, :, None]
        lo = raw[:, :, :UB]
        hi = raw[:, :, 1:]
        buf[:, :, :] = (lo >> s0) | jnp.where(
            s0 == 0, jnp.uint32(0), hi << ((jnp.uint32(32) - s0) & jnp.uint32(31))
        )

    b = buf[:, :, :]
    # bounce words 0-1 through 2-D scratch: arithmetic DIRECTLY on a
    # minor-index slice of a 3-D block computes wrong lanes on this Mosaic
    # (stores of the same slice are fine — measured; the scratch round-trip
    # forces a clean relayout)
    w0s[:, :] = b[:, :, 0]
    w1s[:, :] = b[:, :, 1]
    w0 = w0s[:, :]
    w1 = w1s[:, :]
    ones = _trailing_ones(w0)
    esc = ones >= ESCAPE_Q
    q = jnp.minimum(ones, ESCAPE_Q - 1).astype(jnp.uint32)

    ku = k_ref[:, :].astype(jnp.uint32)  # [R, 1]
    kmask = (jnp.uint32(1) << ku) - jnp.uint32(1)
    ki = k_ref[:, :].astype(jnp.int32)

    v = (w0 >> (q + jnp.uint32(1))) | (w1 << (jnp.uint32(31) - q))
    z_norm = (q << ku) | (v & kmask)
    z_esc = (w0 >> jnp.uint32(ESCAPE_Q)) | (w1 << jnp.uint32(32 - ESCAPE_Q))
    z = jnp.where(esc, z_esc, z_norm)

    # explicit i32 constants: a bare python int here becomes a weak i64
    # under jax_enable_x64 and sends Mosaic's convert-lowering into
    # unbounded recursion (measured on this platform)
    length = jnp.where(
        esc, jnp.int32(MAX_CODE_BITS), q.astype(jnp.int32) + jnp.int32(1) + ki
    )
    active = t < nsub_ref[:, :]
    z = jnp.where(active, z, jnp.uint32(0))
    length = jnp.where(active, length, jnp.int32(0))

    zbuf[pl.ds(t, 1), :, :] = z[None, :, :]

    # shift the whole buffer down by `length` bits (word step 0/1 + funnel)
    zero = jnp.zeros_like(b[:, :, :1])
    # minor-dim insertion on the 32-bit array, not the i1 compare (Mosaic)
    d1 = length[:, :, None] >= 32
    s2 = (length & 31).astype(jnp.uint32)[:, :, None]
    b1 = jnp.concatenate([b[:, :, 1:], zero], axis=2)
    b2 = jnp.concatenate([b[:, :, 2:], zero, zero], axis=2)
    lo = jnp.where(d1, b1, b)
    hi = jnp.where(d1, b2, b1)
    buf[:, :, :] = (lo >> s2) | jnp.where(
        s2 == 0, jnp.uint32(0), hi << ((jnp.uint32(32) - s2) & jnp.uint32(31))
    )

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:, :, :] = zbuf[:, :, :]


def unpack_pallas(
    staged: jnp.ndarray,  # [B, SW + S*(UB+1)] u32 (stage_rice_scan rows)
    k: jnp.ndarray,       # [B] i32
    n: jnp.ndarray,       # [B] i32 valid samples
    block_len: int,
    buf_words: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns z [B, L] uint32 (zeros past n). Contract of unpack_scan."""
    B = staged.shape[0]
    L = block_len
    SW = sync_words(L)
    subs = subs_per_block(L)
    UB = buf_words
    T = min(SUB_BLOCK, L)

    # sync-table decode in XLA (lane-strided u16 unpack won't lower in Mosaic)
    sub_lens = read_sync_table(staged, L)  # [B, S] i32
    boff = jnp.cumsum(sub_lens, axis=1) - sub_lens + SW * 32
    s0 = (boff & 31).astype(jnp.int32)

    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK
    cap = jnp.minimum(jnp.int32(T), jnp.int32(L) - sub_start)
    n_sub = jnp.clip(n[:, None] - sub_start[None, :], 0, cap[None, :])

    raw = staged[:, SW:].reshape(B, subs, UB + 1)

    Bp = (B + ROWS - 1) // ROWS * ROWS
    if Bp != B:
        raw = jnp.pad(raw, ((0, Bp - B), (0, 0), (0, 0)))
        s0 = jnp.pad(s0, ((0, Bp - B), (0, 0)))
        n_sub = jnp.pad(n_sub, ((0, Bp - B), (0, 0)))
        k = jnp.pad(k, (0, Bp - B))

    zt = pl.pallas_call(
        functools.partial(_unpack_kernel, UB=UB, T=T),
        grid=(Bp // ROWS, T),
        in_specs=[
            pl.BlockSpec((ROWS, subs, UB + 1), lambda i, t: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, subs), lambda i, t: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, subs), lambda i, t: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda i, t: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, ROWS, subs), lambda i, t: (_I0, i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Bp, subs), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, subs, UB), jnp.uint32),
            pltpu.VMEM((T, ROWS, subs), jnp.uint32),
            pltpu.VMEM((ROWS, subs), jnp.uint32),
            pltpu.VMEM((ROWS, subs), jnp.uint32),
        ],
        interpret=interpret,
    )(raw, s0, n_sub, k[:, None])

    z = jnp.moveaxis(zt[:, :B, :], 0, 2)  # [B, S, T]
    if subs == 1:
        return z[:, 0, :L]
    last_cap = L - SUB_BLOCK * (subs - 1)
    body = z[:, :-1, :].reshape(B, -1)
    tail = z[:, -1, :last_cap]
    return jnp.concatenate([body, tail], axis=1)

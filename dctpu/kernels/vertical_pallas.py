"""Pallas TPU kernels for the VERTICAL coder — the compiled hot path.

This Mosaic version cannot lower scalar VMEM stores or dynamic_slice
(measured; see kernels/pack_pallas.py for the interpret-only Rice kernels),
but the VERTICAL coder needs neither: every step is an elementwise op, a
lane-axis reduction, or a static relayout. Work layout: one sub-block per
sublane row — tiles of [TR rows, 128 lanes] put 128 samples of TR sub-blocks
on the VPU at once, with the whole region batch resident in VMEM.

decode_vertical_pallas mirrors kernels/vertical_xla.decode_vertical
bit-for-bit behind the same staged-region interface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import EXC_CAP, SUB_BLOCK
from dctpu.kernels.vertical_xla import PLANE_REGION, POS_REGION, REGION_WORDS

TR = 256  # sub-block rows per grid program


def _decode_kernel(region_ref, b_ref, nexc_ref, count_ref, z_ref, *, max_planes):
    lane = jax.lax.broadcasted_iota(jnp.uint32, (TR, SUB_BLOCK), 1)
    shifts = lane % jnp.uint32(32)
    group = lane >> jnp.uint32(5)                         # lane // 32 in [0, 4)

    z = jnp.zeros((TR, SUB_BLOCK), dtype=jnp.uint32)
    for p in range(max_planes):
        # rep[r, i] = plane-p word i//32, via 4 broadcast-selects
        rep = jnp.zeros((TR, SUB_BLOCK), dtype=jnp.uint32)
        for w in range(4):
            col = region_ref[:, 4 * p + w : 4 * p + w + 1]  # [TR, 1]
            rep = jnp.where(group == w, col, rep)
        z = z | (((rep >> shifts) & jnp.uint32(1)) << jnp.uint32(p))

    bi32 = b_ref[:, :]                                    # [TR, 1] i32
    nexc = nexc_ref[:, :]                                 # [TR, 1] i32
    b = bi32.astype(jnp.uint32)
    # signed min: Mosaic cannot legalize vector arith.minui on this platform
    bsh = jnp.minimum(bi32, 31).astype(jnp.uint32)
    for j in range(EXC_CAP):
        pw = region_ref[:, PLANE_REGION + j // 4 : PLANE_REGION + j // 4 + 1]
        pos = (pw >> jnp.uint32(8 * (j % 4))) & jnp.uint32(0xFF)
        val = region_ref[
            :, PLANE_REGION + POS_REGION + j : PLANE_REGION + POS_REGION + j + 1
        ]
        live = (jnp.int32(j) < nexc) & (bi32 < 32)
        onehot = (lane == pos) & live
        z = z | jnp.where(onehot, val << bsh, jnp.uint32(0))

    count = count_ref[:, :]                               # [TR, 1] i32
    z_ref[:, :] = jnp.where(lane.astype(jnp.int32) < count, z, jnp.uint32(0))


def decode_vertical_staged(
    payload: jnp.ndarray,  # [B, SW + SUBS*REGION_WORDS] staged rows
    n: jnp.ndarray,        # [B] i32
    block_len: int,
    max_planes: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as vertical_xla.decode_vertical, Pallas-backed."""
    from dctpu.constants import subs_per_block, sync_words

    B = payload.shape[0]
    subs = subs_per_block(block_len)
    SW = sync_words(block_len)
    L = block_len

    sync = payload[:, :SW]
    lo = (sync & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (sync >> jnp.uint32(16)).astype(jnp.int32)
    entries = jnp.stack([lo, hi], axis=2).reshape(B, -1)[:, :subs]
    b = (entries & 0x3F).reshape(-1)
    n_exc = (entries >> 6).reshape(-1)

    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK
    cap = jnp.minimum(jnp.int32(SUB_BLOCK), jnp.int32(L) - sub_start)
    count = jnp.clip(n[:, None] - sub_start[None, :], 0, cap[None, :]).reshape(-1)

    regions = payload[:, SW:].reshape(B * subs, REGION_WORDS)
    z = decode_vertical_pallas(regions, b, n_exc, count, max_planes, interpret)
    z = z.reshape(B, subs * SUB_BLOCK)[:, :L]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    return jnp.where(valid, z, jnp.uint32(0))


def decode_vertical_pallas(
    regions: jnp.ndarray,  # [R, REGION_WORDS] u32 (R = B*SUBS, staged)
    b: jnp.ndarray,        # [R] i32 widths
    n_exc: jnp.ndarray,    # [R] i32
    count: jnp.ndarray,    # [R] i32 valid samples per sub-block
    max_planes: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """[R, 128] zigzag values; rows are independent sub-blocks."""
    R = regions.shape[0]
    Rp = (R + TR - 1) // TR * TR
    if Rp != R:
        regions = jnp.pad(regions, ((0, Rp - R), (0, 0)))
        b = jnp.pad(b, (0, Rp - R))
        n_exc = jnp.pad(n_exc, (0, Rp - R))
        count = jnp.pad(count, (0, Rp - R))
    z = pl.pallas_call(
        functools.partial(_decode_kernel, max_planes=max_planes),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, REGION_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, SUB_BLOCK), jnp.uint32),
        interpret=interpret,
    )(
        regions,
        b.astype(jnp.int32)[:, None],
        n_exc.astype(jnp.int32)[:, None],
        count.astype(jnp.int32)[:, None],
    )
    return z[:R]

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import EXC_CAP, SUB_BLOCK
from dctpu.kernels.vertical_xla import PLANE_REGION, POS_REGION, REGION_WORDS

TR = 256  # sub-block rows per grid program

# i32 zero for index maps: a bare 0 returns a weak i64 under jax_enable_x64,
# which this Mosaic cannot legalize in the index-map func.return.
_I0 = np.int32(0)


def _decode_kernel(region_ref, b_ref, nexc_ref, e_ref, count_ref, z_ref, *,
                   max_planes, tr):
    lane = jax.lax.broadcasted_iota(jnp.uint32, (tr, SUB_BLOCK), 1)
    shifts = lane % jnp.uint32(32)
    group = lane >> jnp.uint32(5)                         # lane // 32 in [0, 4)

    z = jnp.zeros((tr, SUB_BLOCK), dtype=jnp.uint32)
    for p in range(max_planes):
        # rep[r, i] = plane-p word i//32, via 4 broadcast-selects
        rep = jnp.zeros((tr, SUB_BLOCK), dtype=jnp.uint32)
        for w in range(4):
            col = region_ref[:, 4 * p + w : 4 * p + w + 1]  # [TR, 1]
            rep = jnp.where(group == w, col, rep)
        z = z | (((rep >> shifts) & jnp.uint32(1)) << jnp.uint32(p))

    bi32 = b_ref[:, :]                                    # [TR, 1] i32
    nexc = nexc_ref[:, :]                                 # [TR, 1] i32
    b = bi32.astype(jnp.uint32)
    # signed min: Mosaic cannot legalize vector arith.minui on this platform.
    # All scalar constants pinned to jnp.int32 — weak i64 constants (x64 mode)
    # send this Mosaic's convert lowering into unbounded recursion.
    bsh = jnp.minimum(bi32, jnp.int32(31)).astype(jnp.uint32)
    # exception values (FORMAT §2.2): raw words when n_exc <= ceil(e/2),
    # else bit-planed — value j collects bit p from the 16-bit half-plane p
    # (planes past e are zero-staged).
    ei = e_ref[:, :]  # [TR, 1] i32
    raw_layout = nexc <= (ei + jnp.int32(1)) // jnp.int32(2)
    for j in range(EXC_CAP):
        v = jnp.zeros_like(z[:, :1])
        for p in range(32):
            w = region_ref[
                :,
                PLANE_REGION + POS_REGION + p // 2 :
                PLANE_REGION + POS_REGION + p // 2 + 1,
            ]
            v = v | (((w >> jnp.uint32(16 * (p % 2) + j)) & jnp.uint32(1))
                     << jnp.uint32(p))
        raw = region_ref[
            :, PLANE_REGION + POS_REGION + j : PLANE_REGION + POS_REGION + j + 1
        ]
        val = jnp.where(raw_layout, raw, v)
        pw = region_ref[:, PLANE_REGION + j // 4 : PLANE_REGION + j // 4 + 1]
        pos = (pw >> jnp.uint32(8 * (j % 4))) & jnp.uint32(0xFF)
        live = (jnp.int32(j) < nexc) & (bi32 < jnp.int32(32))
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
    n_exc = ((entries >> 6) & 0x1F).reshape(-1)
    e = jnp.where(n_exc > 0, ((entries >> 11) & 0x1F).reshape(-1) + 1, 0)

    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK
    cap = jnp.minimum(jnp.int32(SUB_BLOCK), jnp.int32(L) - sub_start)
    count = jnp.clip(n[:, None] - sub_start[None, :], 0, cap[None, :]).reshape(-1)

    regions = payload[:, SW:].reshape(B * subs, REGION_WORDS)
    z = decode_vertical_pallas(
        regions, b, n_exc, e, count, max_planes, interpret
    )
    z = z.reshape(B, subs * SUB_BLOCK)[:, :L]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    return jnp.where(valid, z, jnp.uint32(0))


def _encode_exc_kernel(z_ref, b_ref, pos_ref, val_ref):
    """Exception extraction with all rank-match passes VMEM-resident.

    Mirrors kernels/vertical_xla.exc_extract_xla bit-for-bit: the XLA version
    re-reads the [*, 128] high/rank arrays from HBM on every one of the 16+4
    reduction passes (~20x input traffic, measured ~19 ms of the 25 ms encode
    at 128 MiB); here z is loaded once per tile and every pass runs on VMEM.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    z = z_ref[:, :]
    bi = b_ref[:, :]  # [TR, 1] i32
    bsh = jnp.minimum(bi, 31).astype(jnp.uint32)
    high = jnp.where(bi < 32, z >> bsh, jnp.uint32(0))
    # z is zeroed on invalid lanes, so (z >> b) != 0 <=> bitlen > b & b < 32
    is_exc = high != jnp.uint32(0)
    # Kogge-Stone inclusive prefix sum over lanes (Mosaic has no cumsum):
    # roll right by k and mask the wrapped-around lanes.
    acc = is_exc.astype(jnp.int32)
    k = 1
    while k < SUB_BLOCK:
        # jnp.int32 everywhere, no bare Python ints: a weak i64 constant sends
        # this Mosaic's convert lowering into unbounded recursion (see
        # unpack_pallas), and a bare roll amount lowers to an i64
        # tpu.dynamic_rotate operand, which fails MLIR verification.
        acc = acc + jnp.where(
            lane >= k, pltpu.roll(acc, jnp.int32(k), axis=1), jnp.int32(0)
        )
        k *= 2
    rank = acc - 1

    # The masked sums select exactly one lane per (row, j) — at most one lane
    # has rank == j — so summing in int32 and bitcasting back to uint32 is
    # bit-identical (and mod-2^32 sums would be anyway). This Mosaic cannot
    # lower reductions over unsigned ints (BENCH_r02 regression); u32<->i32
    # astype is a plain bitcast and lowers fine (cf. _decode_kernel).
    vals = []
    for j in range(EXC_CAP):
        m = is_exc & (rank == j)
        vals.append(
            jnp.sum(
                jnp.where(m, high, jnp.uint32(0)).astype(jnp.int32),
                axis=1,
                keepdims=True,
                dtype=jnp.int32,  # explicit: x64 mode would promote to i64
            )
        )
    val_ref[:, :] = jnp.concatenate(vals, axis=1).astype(jnp.uint32)

    byte_sh = ((rank & 3) << 3).astype(jnp.uint32)
    contrib = jnp.where(is_exc, lane.astype(jnp.uint32) << byte_sh, jnp.uint32(0))
    poss = []
    for mw in range(POS_REGION):
        sel = is_exc & ((rank >> 2) == mw)
        poss.append(
            jnp.sum(
                jnp.where(sel, contrib, jnp.uint32(0)).astype(jnp.int32),
                axis=1,
                keepdims=True,
                dtype=jnp.int32,
            )
        )
    pos_ref[:, :] = jnp.concatenate(poss, axis=1).astype(jnp.uint32)


def exc_extract_pallas(
    zs: jnp.ndarray,      # [B, S, 128] u32, zeroed past each sub-block's count
    best_b: jnp.ndarray,  # [B, S] i32 selected widths
    interpret: bool | None = None,
):
    """(pos_words [B, S, 4], vals [B, S, 16]); same contract as the XLA path."""
    if interpret is None:  # auto: compiled on TPU, interpreter elsewhere
        interpret = jax.default_backend() != "tpu"
    B, S, _ = zs.shape
    R = B * S
    Rp = (R + TR - 1) // TR * TR
    z_rows = zs.reshape(R, SUB_BLOCK)
    b_rows = best_b.reshape(R, 1).astype(jnp.int32)
    if Rp != R:
        z_rows = jnp.pad(z_rows, ((0, Rp - R), (0, 0)))
        b_rows = jnp.pad(b_rows, ((0, Rp - R), (0, 0)))
    pos, vals = pl.pallas_call(
        _encode_exc_kernel,
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, POS_REGION), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, EXC_CAP), lambda i: (i, _I0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, POS_REGION), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, EXC_CAP), jnp.uint32),
        ],
        interpret=interpret,
    )(z_rows, b_rows)
    return pos[:R].reshape(B, S, POS_REGION), vals[:R].reshape(B, S, EXC_CAP)


REGION_PAD = 160  # REGION_WORDS padded to the VERT_TILE lattice (ragged.py)


def _region_pack_kernel(region_ref, b_ref, nexc_ref, out_ref):
    """Pack one sub-block region to its live prefix, VMEM-resident.

    Input row (pw=4 layout): [128 p-major plane slots | 4 pos | 16 vals | 0k]
    padded to REGION_PAD=160. Output row: [4b plane words | posw pos |
    vals...] zeros beyond. Replaces the XLA repack+roll stages of
    compact_vertical_semi (two barrel-shift passes over the 160 MB region
    batch in HBM).

    No wraparound masking is needed on the rolls: the live span never
    reaches the row end (4b + posw + 16 <= 148 < 160), so rotated-in lanes
    are always zeros.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, REGION_PAD), 1)
    r = region_ref[:, :]
    b4 = b_ref[:, :] * jnp.int32(4)           # [TR, 1] live plane words
    posw = (nexc_ref[:, :] + jnp.int32(3)) // jnp.int32(4)

    planes = jnp.where(lane < b4, r, jnp.uint32(0))

    # tail (pos+vals) to lane 0: rotate right by W-128 == left by 128
    t0 = pltpu.roll(r, jnp.int32(REGION_PAD - 128), axis=1)
    # close the (POS_REGION - posw)-word gap between pos words and vals
    gap = jnp.int32(POS_REGION) - posw        # in [0, 4]
    vals_dn = t0
    for j in range(3):                        # gap bits 0..2
        sh = 1 << j
        rolled = pltpu.roll(vals_dn, jnp.int32(REGION_PAD - sh), axis=1)
        vals_dn = jnp.where((gap >> j) & 1 == 1, rolled, vals_dn)
    tail = jnp.where(lane < posw, t0, vals_dn)
    tail = jnp.where(lane < posw + jnp.int32(EXC_CAP), tail, jnp.uint32(0))

    # place the tail right after the live planes: rotate right by b4
    rolled = tail
    for j in range(6):                        # (b4 >> 2) bits 0..5
        sh = 4 << j
        shifted = pltpu.roll(rolled, jnp.int32(sh), axis=1)
        rolled = jnp.where(((b4 >> 2) >> j) & 1 == 1, shifted, rolled)
    out_ref[:, :] = planes | rolled


def region_pack_pallas(
    region: jnp.ndarray,  # [R, REGION_WORDS] u32 (pw=4 rows only)
    b: jnp.ndarray,       # [R] i32 selected widths
    n_exc: jnp.ndarray,   # [R] i32
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[R, REGION_PAD] live-packed rows; see _region_pack_kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = region.shape[0]
    Rp = (R + TR - 1) // TR * TR
    region = jnp.pad(
        region, ((0, Rp - R), (0, REGION_PAD - REGION_WORDS))
    )
    b = jnp.pad(b.astype(jnp.int32), (0, Rp - R))[:, None]
    n_exc = jnp.pad(n_exc.astype(jnp.int32), (0, Rp - R))[:, None]
    out = pl.pallas_call(
        _region_pack_kernel,
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, REGION_PAD), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, REGION_PAD), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, REGION_PAD), jnp.uint32),
        interpret=interpret,
    )(region, b, n_exc)
    return out[:R]


def decode_vertical_pallas(
    regions: jnp.ndarray,  # [R, REGION_WORDS] u32 (R = B*SUBS, staged)
    b: jnp.ndarray,        # [R] i32 widths
    n_exc: jnp.ndarray,    # [R] i32
    e: jnp.ndarray,        # [R] i32 exception value widths (0 if no exc)
    count: jnp.ndarray,    # [R] i32 valid samples per sub-block
    max_planes: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """[R, 128] zigzag values; rows are independent sub-blocks.

    Tile rows scale down with max_planes: the kernel's live temporaries grow
    with the plane count, and at TR=256 x 32 planes Mosaic's scoped-VMEM
    stack overflows its 16 MB limit (BENCH r3 interim failure: 26.28M
    requested at the 128 MiB bench geometry).
    """
    trd = 256 if max_planes <= 8 else (128 if max_planes <= 16 else 64)
    R = regions.shape[0]
    Rp = (R + trd - 1) // trd * trd
    if Rp != R:
        regions = jnp.pad(regions, ((0, Rp - R), (0, 0)))
        b = jnp.pad(b, (0, Rp - R))
        n_exc = jnp.pad(n_exc, (0, Rp - R))
        e = jnp.pad(e, (0, Rp - R))
        count = jnp.pad(count, (0, Rp - R))
    z = pl.pallas_call(
        functools.partial(_decode_kernel, max_planes=max_planes, tr=trd),
        grid=(Rp // trd,),
        in_specs=[
            pl.BlockSpec((trd, REGION_WORDS), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((trd, 1), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((trd, 1), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((trd, 1), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((trd, 1), lambda i: (i, _I0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((trd, SUB_BLOCK), lambda i: (i, _I0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, SUB_BLOCK), jnp.uint32),
        interpret=interpret,
    )(
        regions,
        b.astype(jnp.int32)[:, None],
        n_exc.astype(jnp.int32)[:, None],
        e.astype(jnp.int32)[:, None],
        count.astype(jnp.int32)[:, None],
    )
    return z[:R]

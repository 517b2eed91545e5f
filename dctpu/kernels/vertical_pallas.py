"""Pallas TPU kernel for the VERTICAL coder: exception extraction.

This Mosaic version cannot lower scalar VMEM stores or dynamic_slice, but
the VERTICAL coder needs neither: every step is an elementwise op, a
lane-axis reduction, or a static relayout. Work layout: one sub-block per
sublane row — tiles of [TR rows, 128 lanes] put 128 samples of TR
sub-blocks on the VPU at once.

Retired twins (r4, VERDICT r3 weak #4 / next #8): decode_vertical_pallas /
decode_vertical_staged lost every on-chip head-to-head to the XLA decoder
(r3, v5e, 128 MiB: 8.12 vs 3.60 GB/s at max_planes=16, 7.91 vs 2.97 at 32;
the 16 MB VMEM scope capped tiles at 64-128 rows), and region_pack_pallas
became moot when the encoder started emitting packed live-prefix rows
directly (vertical_xla REGION_PAD note). Code: git log on this file.

exc_extract_pallas stays as the backend="pallas" OPT-IN path: since the r4
fused emission, "auto" picks the XLA extraction, which wins the fused
head-to-head (1.50 vs 3.90 ms isolated, 34.1 vs 36.7 ms full encode at
128 MiB — bench/profile_vemit.py; the r1 measurement that favored Pallas
predates the fusion, when XLA re-read the sub-shaped arrays ~20x). The
smoke gate keeps both its lowering and its full-encode bit-exactness
covered (sections 1 and 1c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import EXC_CAP, SUB_BLOCK
from dctpu.kernels.vertical_xla import POS_REGION

TR = 256  # sub-block rows per grid program

# i32 zero for index maps: a bare 0 returns a weak i64 under jax_enable_x64,
# which this Mosaic cannot legalize in the index-map func.return.
_I0 = np.int32(0)


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

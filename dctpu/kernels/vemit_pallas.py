"""VMEM-resident VERTICAL emit mega-kernel (SURVEY §11 gap #2).

The r4 XLA emit (vertical_xla.encode_vertical) is pass-bound: the 32x32
bit transposes, the 33-b width sweep, the EXC_CAP rank-match reductions
and the packed-region assembly each materialize full-size intermediates —
~35 fused HBM passes, 56.5 ms at 128 MiB vs a ~2 ms traffic bound
(bench/roofline.json v_emit frac 0.047). This kernel computes the whole
per-sub-block analysis in ONE VMEM pass over z:

  plane transpose  — select_bp._bt32_rows natural-order butterfly;
  width selection  — select_bp._vertical_key on the in-register exceed
                     table (bit-exact vs vertical_xla._select_width);
  exception extraction — per-lane high bits + a 7-stage LSB-first
                     butterfly stream compaction (monotone move
                     distances d = lane - rank never collide when bits
                     are processed low to high; verified exhaustively in
                     prototype + interpret tests) instead of EXC_CAP
                     rank-match lane reductions.

Outputs per sub-row: raw plane words [128] (butterfly lane order, bit
order already corrected to the disk convention), meta (b, words, n_exc,
e), and the compacted exception values/positions [16]. The b-dependent
packed-region assembly stays in XLA (vertical_xla.encode_vertical tail)
— it is a single fused output pass there, and keeping it out of the
kernel avoids dynamic cross-lane placement.

Design rule from the r4 miscompile (select_bp.py): ONE derived operand
per pallas_call — the kernel takes raw z rows; cnt/pw derive from n only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import SUB_BLOCK
from dctpu.kernels.select_bp import (
    TR,
    _pad_rows,
    _pt_st_e,
    _row_meta,
    _vertical_key,
)

_I0 = np.int32(0)


def _bitrev32(x):
    """Reverse the 32 bits of each u32 element (5 masked swap stages)."""
    x = (x >> jnp.uint32(16)) | (x << jnp.uint32(16))
    x = ((x & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)) | (
        (x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)
    )
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)) | (
        (x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)
    )
    x = ((x & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)) | (
        (x & jnp.uint32(0x33333333)) << jnp.uint32(2)
    )
    return ((x & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1)) | (
        (x & jnp.uint32(0x55555555)) << jnp.uint32(1)
    )


def _prefix_sum_lanes(x, lane):
    """Inclusive prefix sum over the full 128-lane axis (7 shift-adds)."""
    for d in (1, 2, 4, 8, 16, 32, 64):
        sh = jnp.where(
            lane >= jnp.int32(d),
            pltpu.roll(x, jnp.int32(d), axis=1),
            jnp.int32(0),
        )
        x = x + sh
    return x


def _compact_exc(high, is_exc, lane):
    """Butterfly stream compaction of exceptions to lanes 0..n_exc-1.

    Returns (cval [TR, 128] u32, cmeta [TR, 128] i32) with the rank-j
    exception's high bits / sample position at lane j; cmeta < 0 marks
    dead lanes. LSB-first bit order over the move distance d = lane -
    rank is collision-free for monotone d (20k-case prototype sweep).
    """
    rank = _prefix_sum_lanes(is_exc.astype(jnp.int32), lane) - jnp.int32(1)
    dist = lane - rank
    meta = jnp.where(
        is_exc, (dist << jnp.int32(8)) | lane, jnp.int32(-1)
    )
    val = jnp.where(is_exc, high, jnp.uint32(0))
    for k in (1, 2, 4, 8, 16, 32, 64):
        kb = jnp.int32(k << 8)
        mv = (meta >= jnp.int32(0)) & ((meta & kb) != jnp.int32(0))
        edge = lane <= jnp.int32(127 - k)
        sh_meta = jnp.where(
            edge, pltpu.roll(meta, jnp.int32(128 - k), axis=1),
            jnp.int32(-1),
        )
        sh_val = jnp.where(
            edge, pltpu.roll(val, jnp.int32(128 - k), axis=1),
            jnp.uint32(0),
        )
        arr = (sh_meta >= jnp.int32(0)) & ((sh_meta & kb) != jnp.int32(0))
        meta = jnp.where(
            arr, sh_meta - kb, jnp.where(mv, jnp.int32(-1), meta)
        )
        val = jnp.where(arr, sh_val, jnp.where(mv, jnp.uint32(0), val))
    return val, meta


def _vemit_kernel(z_ref, cnt_ref, pw_ref, planes_ref, meta_ref, cval_ref,
                  cpos_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    cnt = cnt_ref[:, :]
    pw = pw_ref[:, :]
    zv = jnp.where(lane < cnt, z_ref[:, :], jnp.uint32(0))
    pt, _st, e = _pt_st_e(zv, lane)

    key = _vertical_key(e, pw)          # [TR, 1]
    b = key & jnp.int32(63)
    words = key >> jnp.int32(6)
    col = jax.lax.broadcasted_iota(jnp.int32, (TR, 32), 1)
    n_exc = jnp.sum(
        jnp.where(col == jnp.int32(31) - b, e, jnp.int32(0)),
        axis=1, keepdims=True, dtype=jnp.int32,
    )
    blmax = jnp.sum(
        (e > jnp.int32(0)).astype(jnp.int32), axis=1, keepdims=True,
        dtype=jnp.int32,
    )
    e_exc = jnp.where(n_exc > jnp.int32(0), blmax - b, jnp.int32(0))
    meta_ref[:, :] = jnp.concatenate([b, words, n_exc, e_exc], axis=1)

    # disk bit convention: the natural-order butterfly leaves bit 31-c =
    # sample 32w+c; one element-wise bit reversal corrects every plane
    planes_ref[:, :] = _bitrev32(pt)

    # exceptions: high bits at the selected width, compacted to rank order
    bb = jnp.broadcast_to(b, (TR, SUB_BLOCK))
    high = jnp.where(
        bb >= jnp.int32(32),
        jnp.uint32(0),
        zv >> jnp.minimum(bb, jnp.int32(31)).astype(jnp.uint32),
    )
    is_exc = high != jnp.uint32(0)
    cval, cmeta = _compact_exc(high, is_exc, lane)
    cval_ref[:, :] = cval[:, :16]
    cpos_ref[:, :] = jnp.where(
        cmeta[:, :16] >= jnp.int32(0),
        cmeta[:, :16] & jnp.int32(0xFF),
        jnp.int32(0),
    )


def vertical_emit_mega(
    z: jnp.ndarray,   # [B, L] u32 zigzag values (garbage ok past n)
    n: jnp.ndarray,   # [B] i32
    block_len: int,
    interpret: bool | None = None,
):
    """One-pass emit analysis. Returns (plane_region [B, S, 128] p-major,
    best_b, best_words, best_exc, best_e [B, S] i32, pos_words [B, S, 4]
    u32, vals [B, S, 16] u32) — bit-identical to the XLA formulation's
    intermediates in vertical_xla.encode_vertical (tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = block_len
    lead = z.shape[:-1]
    R, cnt, pw, subs = _row_meta(lead, n, L)
    pad = subs * SUB_BLOCK - L
    if pad:
        z = jnp.pad(z, [(0, 0)] * len(lead) + [(0, pad)])
    z_rows = z.reshape(R, SUB_BLOCK)
    (z_rows, cnt, pw), Rp = _pad_rows([z_rows, cnt, pw], R)

    planes, meta, cval, cpos = pl.pallas_call(
        _vemit_kernel,
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 4), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 16), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 16), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, SUB_BLOCK), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, 4), jnp.int32),
            jax.ShapeDtypeStruct((Rp, 16), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, 16), jnp.int32),
        ],
        interpret=interpret,
    )(z_rows, cnt, pw)

    S = subs
    sh = lead + (S,)
    # butterfly lane order (w, 31-p) -> p-major (p, w): static relayout,
    # fused into the XLA pack pass downstream
    plane_region = (
        planes[:R].reshape(sh + (4, 32))[..., ::-1]
        .swapaxes(-2, -1).reshape(sh + (128,))
    )
    meta = meta[:R].reshape(sh + (4,))
    best_b = meta[..., 0]
    best_words = meta[..., 1]
    best_exc = meta[..., 2]
    best_e = meta[..., 3]
    j16 = jnp.arange(16, dtype=jnp.int32)
    live = j16 < best_exc[..., None]
    vals = jnp.where(live, cval[:R].reshape(sh + (16,)), jnp.uint32(0))
    pos = jnp.where(
        live, cpos[:R].reshape(sh + (16,)), jnp.int32(0)
    ).astype(jnp.uint32)
    pos4 = pos.reshape(sh + (4, 4))
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 8)[None, None, None, :]
    pos_words = jnp.sum(
        pos4 << shifts, axis=-1, dtype=jnp.uint32
    )  # [B, S, 4]
    return (
        plane_region, best_b, best_words, best_exc, best_e, pos_words,
        vals,
    )

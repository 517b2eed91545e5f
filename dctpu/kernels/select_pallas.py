"""Pallas TPU kernel for exact Golomb-Rice k selection.

The rice encode bottleneck (bench/profile_rice.py: 119 of 151 ms) is the
per-candidate k sweep — choose_k_planes makes ~10 passes over z (two 32x32
bit transposes + smear). Here each [TR, 128] tile of z is loaded into VMEM
once and all k_max+1 exact coded-bit totals are computed in registers:
6 VPU ops per (element, k) instead of 10 HBM passes per candidate.

Bit-identical to rice.choose_k / choose_k_planes (normative escape rule
FORMAT §2): escape at k <=> q = z>>k >= 16 <=> (z >> (k+4)) != 0, and a
non-escaped q equals (z>>k) & 15 — so only u32 shifts/ands, eq-compares and
int32 lane sums are needed, all proven to lower on this Mosaic (cf.
vertical_pallas._encode_exc_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import MAX_CODE_BITS, SUB_BLOCK

TR = 256  # rows (128-sample sub-blocks) per grid program

# i32 zero for index maps: bare 0 is a weak i64 under x64 and fails to
# legalize in the index-map func.return (see vertical_pallas).
_I0 = np.int32(0)


def _len_cols(z, valid, k_max):
    """Per-k coded-length lane sums [TR, 1] x (k_max+1), PAIR-PACKED.

    Lane reductions dominate this kernel family's cost (measured: the
    58-reduction adaptive kernel ran ~23 ms/candidate at 128 MiB). A
    per-lane length is <= MAX_CODE_BITS=48, so a 128-lane sum is < 2^13 —
    two k's share one i32 reduction in 16-bit fields with no carry between
    fields (exact). k_max+1 -> ceil((k_max+1)/2) reductions.
    """
    half = (k_max + 2) // 2
    packed = []
    for k in range(half):
        q4 = ((z >> jnp.uint32(k)) & jnp.uint32(15)).astype(jnp.int32)
        esc = (z >> jnp.uint32(k + 4)) != jnp.uint32(0)
        ln = jnp.where(esc, jnp.int32(MAX_CODE_BITS), q4 + jnp.int32(k + 1))
        ln = jnp.where(valid, ln, jnp.int32(0))
        k2 = k + half
        if k2 <= k_max:
            q4b = ((z >> jnp.uint32(k2)) & jnp.uint32(15)).astype(jnp.int32)
            escb = (z >> jnp.uint32(k2 + 4)) != jnp.uint32(0)
            lnb = jnp.where(
                escb, jnp.int32(MAX_CODE_BITS), q4b + jnp.int32(k2 + 1)
            )
            lnb = jnp.where(valid, lnb, jnp.int32(0))
            ln = ln + (lnb << jnp.int32(16))
        packed.append(
            jnp.sum(ln, axis=1, keepdims=True, dtype=jnp.int32)
        )
    cols = []
    for k in range(k_max + 1):
        if k < half:
            cols.append(packed[k] & jnp.int32(0xFFFF))
        else:
            cols.append(packed[k - half] >> jnp.int32(16))
    return cols


def _totals_kernel(z_ref, cnt_ref, out_ref, *, k_max):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    z = z_ref[:, :]
    valid = lane < cnt_ref[:, :]
    out_ref[:, :] = jnp.concatenate(_len_cols(z, valid, k_max), axis=1)


def _adaptive_kernel(z_ref, cnt_ref, pw_ref, out_ref, *, k_max):
    """Joint totals for FORMAT §4.1 selection, one VMEM pass over z.

    out[:, :k_max+1] = exact rice coded bits per k (== _totals_kernel);
    out[:, k_max+1]  = exact VERTICAL live word count for this sub-row
                       (mirrors vertical_xla._select_width: argmin_b of
                       words(b) over b with n_exc(b) <= EXC_CAP, ties ->
                       smallest b — only the word count is needed here).

    Replaces the per-candidate smear + 32x32 transpose + popcount passes of
    vertical_total_words (~3 HBM passes each) in adaptive_select.
    """
    from dctpu.constants import EXC_CAP

    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    z = z_ref[:, :]
    valid = lane < cnt_ref[:, :]
    zv = jnp.where(valid, z, jnp.uint32(0))
    cols = _len_cols(z, valid, k_max)

    # E[b] = #samples with bitlen > b (zv zeroed on invalid lanes).
    # QUAD-PACKED reductions: counts <= 128 < 2^8, so four b's share one
    # i32 lane sum in 8-bit fields (no cross-field carry; exact). 33 -> 9.
    E_packed = []
    for b0 in range(9):
        acc = None
        for j in range(4):
            b = b0 + 9 * j
            if b > 32:
                break
            t = ((zv >> jnp.uint32(b)) != jnp.uint32(0)).astype(jnp.int32)
            t = t << jnp.int32(8 * j)
            acc = t if acc is None else acc + t
        E_packed.append(
            jnp.sum(acc, axis=1, keepdims=True, dtype=jnp.int32)
        )
    E = []
    for b in range(33):
        E.append((E_packed[b % 9] >> jnp.int32(8 * (b // 9)))
                 & jnp.int32(0xFF))
    blmax = jnp.zeros((TR, 1), jnp.int32)
    for b in range(33):
        blmax = blmax + (E[b] > jnp.int32(0)).astype(jnp.int32)
    pw = pw_ref[:, :]  # [TR, 1] plane words of this sub index
    best_key = None
    for b in range(33):
        e_b = jnp.maximum(blmax - jnp.int32(b), jnp.int32(0))
        vw = jnp.where(
            E[b] > jnp.int32(0),
            jnp.minimum(E[b], (e_b + jnp.int32(1)) // jnp.int32(2)),
            jnp.int32(0),
        )
        words = pw * jnp.int32(b) + (E[b] + jnp.int32(3)) // jnp.int32(4) + vw
        words = jnp.where(
            E[b] <= jnp.int32(EXC_CAP), words, jnp.int32(1 << 24)
        )
        key = words * jnp.int32(64) + jnp.int32(b)
        best_key = key if best_key is None else jnp.minimum(best_key, key)
    cols.append(best_key >> jnp.int32(6))
    out_ref[:, :] = jnp.concatenate(cols, axis=1)


def adaptive_totals_pallas(
    z: jnp.ndarray,   # [..., L] u32 zigzag values (garbage ok past n)
    n: jnp.ndarray,   # [...] i32 valid counts
    block_len: int,
    k_max: int,
    interpret: bool | None = None,
):
    """(rice_totals [..., k_max+1] i32, vertical_words [...] i32).

    One VMEM pass per candidate for the FORMAT §4.1 joint selection — see
    _adaptive_kernel. Bit-identical to (choose_k_planes totals,
    vertical_total_words) (tests/test_adaptive.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from dctpu.constants import subs_per_block

    assert k_max < 32 and k_max + 4 <= 28
    assert block_len * MAX_CODE_BITS < 2**26  # packed-key bound (choose_k)
    L = block_len
    lead = z.shape[:-1]
    subs = subs_per_block(L)
    pad = subs * SUB_BLOCK - L
    if pad:
        z = jnp.pad(z, [(0, 0)] * len(lead) + [(0, pad)])
    R = int(np.prod(lead, dtype=np.int64)) * subs if lead else subs
    z_rows = z.reshape(R, SUB_BLOCK)

    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK
    cnt = jnp.clip(
        jnp.asarray(n).astype(jnp.int32)[..., None] - sub_start,
        0,
        SUB_BLOCK,
    ).reshape(R, 1)
    from dctpu.constants import sub_caps

    pw_row = jnp.asarray(
        np.array([(c + 31) // 32 for c in sub_caps(L)], np.int32)
    )
    pw = jnp.broadcast_to(
        pw_row[None, :], lead + (subs,) if lead else (subs,)
    ).reshape(R, 1)

    Rp = (R + TR - 1) // TR * TR
    if Rp != R:
        z_rows = jnp.pad(z_rows, ((0, Rp - R), (0, 0)))
        cnt = jnp.pad(cnt, ((0, Rp - R), (0, 0)))
        pw = jnp.pad(pw, ((0, Rp - R), (0, 0)))

    K2 = k_max + 2
    out = pl.pallas_call(
        functools.partial(_adaptive_kernel, k_max=k_max),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, K2), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, K2), jnp.int32),
        interpret=interpret,
    )(z_rows, cnt, pw)
    per_sub = out[:R].reshape(lead + (subs, K2))
    totals = per_sub[..., : k_max + 1].sum(axis=-2, dtype=jnp.int32)
    vwords = per_sub[..., k_max + 1].sum(axis=-1, dtype=jnp.int32)
    return totals, vwords


def rice_totals_pallas(
    z: jnp.ndarray,   # [..., L] u32 zigzag values (garbage ok past n)
    n: jnp.ndarray,   # [...] i32 valid counts
    block_len: int,
    k_max: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[..., k_max+1] exact total coded bits per k (int32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from dctpu.constants import subs_per_block

    L = block_len
    lead = z.shape[:-1]
    subs = subs_per_block(L)
    pad = subs * SUB_BLOCK - L
    if pad:
        z = jnp.pad(z, [(0, 0)] * len(lead) + [(0, pad)])
    R = int(np.prod(lead, dtype=np.int64)) * subs if lead else subs
    z_rows = z.reshape(R, SUB_BLOCK)

    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK
    cnt = jnp.clip(
        jnp.asarray(n).astype(jnp.int32)[..., None] - sub_start,
        0,
        SUB_BLOCK,
    ).reshape(R, 1)

    Rp = (R + TR - 1) // TR * TR
    if Rp != R:
        z_rows = jnp.pad(z_rows, ((0, Rp - R), (0, 0)))
        cnt = jnp.pad(cnt, ((0, Rp - R), (0, 0)))

    K1 = k_max + 1
    out = pl.pallas_call(
        functools.partial(_totals_kernel, k_max=k_max),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, K1), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, K1), jnp.int32),
        interpret=interpret,
    )(z_rows, cnt)
    totals = out[:R].reshape(lead + (subs, K1)).sum(
        axis=-2, dtype=jnp.int32
    )
    return totals

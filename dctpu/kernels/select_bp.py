"""Bit-plane selection kernel: totals from in-VMEM plane popcounts.

The round-4 selection kernels (select_pallas.py) compute exact per-k rice
totals and vertical word counts with lane reductions — even packed-field
(58 -> 22 reductions/tile) they dominate the adaptive encode pipeline
(94 ms of 154 ms at 128 MiB). This kernel eliminates lane reductions
entirely using the choose_k_planes identity (codec/rice.py):

  L(k) = 48*E[k+4] + (k+1)*(n - E[k+4]) + D_k - R_k
  D_k  = sum_{j<4} 2^j P[k+j]
  R_k  = sum_{j<4} 2^j #{bit_{k+j} set AND bitlen > k+4}

with P (plane popcounts) and E (exceed counts) from TWO in-kernel grouped
32x32 bit transposes (transpose_pallas, verified on chip) + popcount
(mosaic_probe4: lowers bit-exactly). Per [TR, 128] tile: ~100 elementwise
ops and ZERO log-tree lane reductions; every per-k quantity is a static
column slice of the [TR, 32] popcount tables. The vertical exact word
count reuses E, as in select_pallas._adaptive_kernel.

Status: bit-identical to adaptive_totals_pallas (interpret + chip,
tests/test_select_bp.py) but v1 LOSES the on-chip head-to-head at bench
geometry: 27.2 ms vs 14.9 ms per candidate (B=8192, L=4096). The
transposes are cheap; the per-(k, j) R_k column math runs ~500
instructions on [TR, 1] vectors at 1/128 lane utilization. The v2 path
(if pursued): compute EVERY per-k quantity as [TR, 32]-wide table ops —
D and R for all k at once from lane-rolls of the popcount tables, the
joint masks via constant-plane-offset grouped rolls of st against pt
(offset 4-j is k-independent). NOT the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import EXC_CAP, MAX_CODE_BITS, SUB_BLOCK
from dctpu.kernels.transpose_pallas import bit_transpose32_rows

TR = 256

_I0 = np.int32(0)


def _cols4(t, p):
    """The four group-words of plane p: static lane slices [TR, 4-ish]."""
    return [t[:, 32 * w + 31 - p : 32 * w + 32 - p] for w in range(4)]


def _bp_kernel(zr_ref, sr_ref, cnt_ref, pw_ref, out_ref, *, k_max):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    pt = bit_transpose32_rows(zr_ref[:, :], lane)
    st = bit_transpose32_rows(sr_ref[:, :], lane)
    pc = jax.lax.population_count(pt).astype(jnp.int32)
    sc = jax.lax.population_count(st).astype(jnp.int32)
    # [TR, 32] tables in REVERSED plane order: column 31-p holds plane p
    q = pc[:, 0:32] + pc[:, 32:64] + pc[:, 64:96] + pc[:, 96:128]
    e = sc[:, 0:32] + sc[:, 32:64] + sc[:, 64:96] + sc[:, 96:128]

    def P(p):  # [TR, 1]
        return q[:, 31 - p : 32 - p]

    def E(b):  # [TR, 1]; E[32] == 0 (no bits >= 32)
        if b >= 32:
            return jnp.zeros_like(cnt_ref[:, :])
        return e[:, 31 - b : 32 - b]

    n = cnt_ref[:, :]
    cols = []
    for k in range(k_max + 1):
        Ek4 = E(k + 4)
        D = None
        for j in range(4):
            t = P(k + j) << jnp.int32(j)
            D = t if D is None else D + t
        R = None
        st4 = _cols4(st, k + 4)
        for j in range(4):
            ptj = _cols4(pt, k + j)
            rj = None
            for w in range(4):
                c = jax.lax.population_count(
                    ptj[w] & st4[w]
                ).astype(jnp.int32)
                rj = c if rj is None else rj + c
            rj = rj << jnp.int32(j)
            R = rj if R is None else R + rj
        t_k = (
            jnp.int32(MAX_CODE_BITS) * Ek4
            + jnp.int32(k + 1) * (n - Ek4)
            + D
            - R
        )
        cols.append(t_k)

    # exact vertical word count (mirrors select_pallas._adaptive_kernel)
    blmax = jnp.zeros_like(n)
    for b in range(32):
        blmax = blmax + (E(b) > jnp.int32(0)).astype(jnp.int32)
    pw = pw_ref[:, :]
    best_key = None
    for b in range(33):
        Eb = E(b)
        e_b = jnp.maximum(blmax - jnp.int32(b), jnp.int32(0))
        vw = jnp.where(
            Eb > jnp.int32(0),
            jnp.minimum(Eb, (e_b + jnp.int32(1)) // jnp.int32(2)),
            jnp.int32(0),
        )
        words = pw * jnp.int32(b) + (Eb + jnp.int32(3)) // jnp.int32(4) + vw
        words = jnp.where(Eb <= jnp.int32(EXC_CAP), words, jnp.int32(1 << 24))
        key = words * jnp.int32(64) + jnp.int32(b)
        best_key = key if best_key is None else jnp.minimum(best_key, key)
    cols.append(best_key >> jnp.int32(6))
    out_ref[:, :] = jnp.concatenate(cols, axis=1)


def _smear(z):
    z = z | (z >> jnp.uint32(1))
    z = z | (z >> jnp.uint32(2))
    z = z | (z >> jnp.uint32(4))
    z = z | (z >> jnp.uint32(8))
    return z | (z >> jnp.uint32(16))


def adaptive_totals_bp(
    z: jnp.ndarray,   # [..., L] u32 zigzag values (garbage ok past n)
    n: jnp.ndarray,   # [...] i32 valid counts
    block_len: int,
    k_max: int,
    interpret: bool | None = None,
):
    """(rice_totals [..., k_max+1] i32, vertical_words [...] i32).

    Same contract and bit-identical results as
    select_pallas.adaptive_totals_pallas (tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from dctpu.constants import sub_caps, subs_per_block

    assert k_max < 32 and k_max + 4 <= 28
    assert block_len * MAX_CODE_BITS < 2**26
    L = block_len
    lead = z.shape[:-1]
    subs = subs_per_block(L)
    pad = subs * SUB_BLOCK - L
    lane_idx = jnp.arange(L, dtype=jnp.int32)
    valid = lane_idx < jnp.asarray(n).astype(jnp.int32)[..., None]
    zv = jnp.where(valid, z, jnp.uint32(0))
    if pad:
        zv = jnp.pad(zv, [(0, 0)] * len(lead) + [(0, pad)])
    R = int(np.prod(lead, dtype=np.int64)) * subs if lead else subs
    # within-group lane reversal (fuses into the producers above)
    zg = zv.reshape(lead + (subs, 4, 32))[..., ::-1]
    sg = _smear(zg)
    z_rows = zg.reshape(R, SUB_BLOCK)
    s_rows = sg.reshape(R, SUB_BLOCK)

    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK
    cnt = jnp.clip(
        jnp.asarray(n).astype(jnp.int32)[..., None] - sub_start,
        0, SUB_BLOCK,
    ).reshape(R, 1)
    pw_row = jnp.asarray(
        np.array([(c + 31) // 32 for c in sub_caps(L)], np.int32)
    )
    pw = jnp.broadcast_to(
        pw_row[None, :], lead + (subs,) if lead else (subs,)
    ).reshape(R, 1)

    Rp = (R + TR - 1) // TR * TR
    if Rp != R:
        z_rows = jnp.pad(z_rows, ((0, Rp - R), (0, 0)))
        s_rows = jnp.pad(s_rows, ((0, Rp - R), (0, 0)))
        cnt = jnp.pad(cnt, ((0, Rp - R), (0, 0)))
        pw = jnp.pad(pw, ((0, Rp - R), (0, 0)))

    K2 = k_max + 2
    out = pl.pallas_call(
        functools.partial(_bp_kernel, k_max=k_max),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
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
    )(z_rows, s_rows, cnt, pw)
    per_sub = out[:R].reshape(lead + (subs, K2))
    totals = per_sub[..., : k_max + 1].sum(axis=-2, dtype=jnp.int32)
    vwords = per_sub[..., k_max + 1].sum(axis=-1, dtype=jnp.int32)
    return totals, vwords

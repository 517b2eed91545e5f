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

Status: QUARANTINED — NOT a production path. v1 (git history) indexed
the tables per (k, j) on [TR, 1] columns and lost the head-to-head (27.2
vs 14.9 ms/candidate at B=8192, L=4096); v2 (this file) computes every
per-k quantity as [TR, 32]-wide table ops and wins standalone (12.3 vs
15.5 ms/candidate, bit-exact on chip and in interpret mode). BUT when
called INSIDE the multi-kernel adaptive-select jit on the axon backend
it MISCOMPILES: silently wrong totals on 3 of 6 candidates at bench
geometry, while the identical standalone call on the identical
materialized inputs is correct. jax.lax.optimization_barrier on the
operands does NOT fix it (suspect: operand layout assignment in the
larger module). Caught r4 because the adaptive group split diverged from
the CPU-normative 1351/6841 — a reminder that CPU-vs-TPU divergence
checks on PRODUCTION-SHAPED programs (not just kernel unit tests) are
load-bearing on this platform. Round 5: reproduce minimally, then either
find the layout pin that fixes it or report the Mosaic bug.
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


def _shift_hi(t, j):
    """[TR, 32] table shifted toward HIGHER columns by j, zero fill.

    With the reversed column convention (column c holds plane p = 31-c),
    this maps column 31-k to the value previously at 31-(k+j): the
    whole-table form of 'index plane k+j for every k at once'."""
    if j == 0:
        return t
    # explicit typed zeros: jnp.pad's weak-0 constant sends this Mosaic's
    # convert lowering into recursion (cf. the pitfalls list)
    z = jnp.zeros((t.shape[0], j), t.dtype)
    return jnp.concatenate([z, t[:, :-j]], axis=1)


def _bp_kernel(zr_ref, sr_ref, cnt_ref, pw_ref, out_ref, *, k_max):
    """v2: every per-k/per-b quantity is a [TR, 32]-wide table op.

    v1 (git history) indexed the popcount tables per (k, j) on [TR, 1]
    columns — ~2000 instructions at 1/128 lane utilization, losing the
    head-to-head. Here the joint counts use the k-INDEPENDENT plane
    offset 4-j (st plane k+4 vs pt plane k+j): four grouped-roll + AND +
    popcount passes give R for every k at once, and D/E/words/key math
    happens on 32-wide tables; the only reductions are two width-32 ones
    (blmax, key min).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    pt = bit_transpose32_rows(zr_ref[:, :], lane)
    st = bit_transpose32_rows(sr_ref[:, :], lane)
    pc = jax.lax.population_count(pt).astype(jnp.int32)
    sc = jax.lax.population_count(st).astype(jnp.int32)
    # [TR, 32] tables in REVERSED plane order: column 31-p holds plane p
    q = pc[:, 0:32] + pc[:, 32:64] + pc[:, 64:96] + pc[:, 96:128]
    e = sc[:, 0:32] + sc[:, 32:64] + sc[:, 64:96] + sc[:, 96:128]

    # joint counts: rcw_j[c] = #{bit p set AND bitlen > p+(4-j)} at plane
    # p = 31-c. st plane p+D sits D lanes BELOW plane p (reversed order),
    # so align with a grouped roll toward higher lanes by D; wrapped lanes
    # are planes >= 32 (no such bits) -> zero-masked.
    from dctpu.kernels.transpose_pallas import grouped_roll

    rcw = []
    for j in range(4):
        D = 4 - j
        st_sh = jnp.where(
            (lane & jnp.int32(31)) >= jnp.int32(D),
            grouped_roll(st, D, lane),
            jnp.uint32(0),
        )
        rc = jax.lax.population_count(pt & st_sh).astype(jnp.int32)
        rcw.append(
            rc[:, 0:32] + rc[:, 32:64] + rc[:, 64:96] + rc[:, 96:128]
        )

    # tables over all k at columns 31-k
    D_t = None
    R_t = None
    for j in range(4):
        d = _shift_hi(q, j) << jnp.int32(j)
        D_t = d if D_t is None else D_t + d
        r = _shift_hi(rcw[j], j) << jnp.int32(j)
        R_t = r if R_t is None else R_t + r
    E4_t = _shift_hi(e, 4)
    n = cnt_ref[:, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (TR, 32), 1)
    kp1 = jnp.int32(32) - col  # k+1 at column 31-k
    t_t = (
        jnp.int32(MAX_CODE_BITS) * E4_t + kp1 * (n - E4_t) + D_t - R_t
    )
    cols = [t_t[:, 31 - k : 32 - k] for k in range(k_max + 1)]

    # exact vertical word count, table-wide over b = 31-col (b=32 sep.)
    blmax = jnp.sum(
        (e > jnp.int32(0)).astype(jnp.int32), axis=1, keepdims=True,
        dtype=jnp.int32,
    )
    pw = pw_ref[:, :]
    b_t = jnp.int32(31) - col
    e_b = jnp.maximum(blmax - b_t, jnp.int32(0))
    vw = jnp.where(
        e > jnp.int32(0),
        jnp.minimum(e, (e_b + jnp.int32(1)) // jnp.int32(2)),
        jnp.int32(0),
    )
    words = pw * b_t + (e + jnp.int32(3)) // jnp.int32(4) + vw
    words = jnp.where(e <= jnp.int32(EXC_CAP), words, jnp.int32(1 << 24))
    key_t = words * jnp.int32(64) + b_t
    key32 = pw * jnp.int32(32) * jnp.int32(64) + jnp.int32(32)  # E[32]=0
    best_key = jnp.minimum(
        jnp.min(key_t, axis=1, keepdims=True), key32
    )
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

    # MANDATORY on this backend: without the barrier, XLA fuses the
    # reversal/smear producers into the pallas_call operand cluster and
    # MISCOMPILES — silently wrong totals on 3 of 6 candidates at bench
    # geometry when called inside a larger jit (standalone calls were
    # correct, which is why the unit tests passed). Verified r4.
    z_rows, s_rows, cnt, pw = jax.lax.optimization_barrier(
        (z_rows, s_rows, cnt, pw)
    )
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

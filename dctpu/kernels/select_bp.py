"""Bit-plane selection kernels v3: totals from in-VMEM plane popcounts.

The adaptive encode bottleneck is the FORMAT §4.1 joint (candidate, coder)
selection: select_pallas.adaptive_totals_pallas computes exact per-k rice
totals and vertical word counts with packed lane reductions — 94 ms of the
159 ms pipeline at 128 MiB (bench_results.json r4). This family replaces
the reductions with the choose_k_planes identity (codec/rice.py):

  L(k) = 48*E[k+4] + (k+1)*(n - E[k+4]) + D_k - R_k
  D_k  = sum_{j<4} 2^j P[k+j]
  R_k  = sum_{j<4} 2^j #{bit_{k+j} set AND bitlen > k+4}

where P (plane popcounts), E (exceed counts) and the joint counts come
from ONE in-kernel grouped 32x32 bit transpose + popcounts (mosaic_probe4:
popcount lowers bit-exactly). The vertical exact word count reuses E, as
in select_pallas._adaptive_kernel.

v3 design rules (r4 miscompile post-mortem, bench/repro_bp_min.py):

* ONE derived operand per kernel. v2 fed TWO operands (z rows and
  smear(z) rows) sharing a fused producer chain; on the axon backend the
  producer fusion into the operand buffers silently corrupts one of them
  when the chain includes the candidate derivation (wrong totals on 3 of
  6 candidates in the full adaptive jit, bit-exact standalone — the same
  jit with z additionally returned as a root output is correct, and
  optimization_barrier does NOT help). select_pallas's single-z-operand
  pattern has been gate-green at production geometry all of r4, so v3
  takes raw z rows only and derives everything else in registers:
  - the smear transpose st is a within-group PREFIX-OR over the plane
    lanes of pt (smear bit b = OR of z bits >= b, and the butterfly puts
    plane p at lane 31-p), 5 masked-roll stages instead of v2's second
    full transpose + an extra 128 MiB operand round trip;
  - validity masking moved in-kernel (cnt operand, as select_pallas).
* The butterfly runs on NATURAL lane order. v2 pre/post-reversed lanes
  in XLA to match vertical_xla.bit_transpose32's convention; measured on
  one-hot probes, the masked butterfly on natural input lands plane p at
  lane 31-p with sample c at bit 31-c — and every consumer here is a
  popcount or an aligned AND, both invariant to the within-word bit
  permutation, so the reversed-column table algebra applies directly and
  the reversal producers (another miscompile ingredient) are gone.
* Single-roll grouped shifts. grouped_roll pays 2 full rolls + select
  because wrapped lanes need the complementary rotation; in the butterfly
  the consumed lanes never wrap (stage j reads lane l+j only where bit j
  of l is clear, l-j only where it is set), so one pltpu.roll per
  neighbor suffices. Same for the prefix-OR/joint shifts, whose wrapped
  lanes are masked to zero anyway.

adaptive_totals_xbp additionally derives the DELTA and DOUBLE_DELTA
candidates in-register from the raw sample rows (saves materializing +
re-reading their z arrays: ~3 HBM passes of input size per select), with
the two cross-row prev samples folded into a widened [TR, 2] side operand.
LPC candidates stay outside: the Q16 accumulator needs int64, and s64
in-kernel is silently wrong on this Mosaic (bench/mosaic_probe3.py).

History: v1 (per-(k, j) column indexing) lost the head-to-head 27.2 vs
14.9 ms/candidate; v2 (32-wide tables, operands from XLA) won standalone
12.3 vs 15.5 but miscompiled in-jit and was quarantined (r4 VERDICT #2);
v3 is the landing attempt with the operand pattern fixed. The smoke gate
diffs auto-vs-xla selection at production geometry on every run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import EXC_CAP, MAX_CODE_BITS, SUB_BLOCK

TR = 256

_I0 = np.int32(0)


def _bt32_rows(x):
    """Grouped 32x32 bit transpose on [TR, 128] u32, natural lane order.

    Output lane 32w + 31-p holds the plane-p bitmask of word-group w (bit
    31-c = sample 32w+c). Downstream consumers are popcounts and aligned
    ANDs, so only the lane->plane map matters (module doc)."""
    masks = (0x0000FFFF, 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    j = 16
    for m in masks:
        mu = jnp.uint32(m)
        upper = (lane & jnp.int32(j)) == jnp.int32(0)
        pd = pltpu.roll(x, jnp.int32(128 - j), axis=1)  # pd[l] = x[l+j]
        pu = pltpu.roll(x, jnp.int32(j), axis=1)        # pu[l] = x[l-j]
        sh = jnp.uint32(j)
        t_up = (x ^ (pd >> sh)) & mu
        t_low = (pu ^ (x >> sh)) & mu
        x = jnp.where(upper, x ^ t_up, x ^ (t_low << sh))
        j >>= 1
    return x


def _shift_up_lanes(t, d, lane):
    """t shifted toward HIGHER lanes by d within each 32-group, zero fill."""
    return jnp.where(
        (lane & jnp.int32(31)) >= jnp.int32(d),
        pltpu.roll(t, jnp.int32(d), axis=1),
        jnp.uint32(0) if t.dtype == jnp.uint32 else jnp.int32(0),
    )


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


def _fold4(t):
    """[TR, 128] -> [TR, 32]: sum the four 32-lane word groups."""
    return t[:, 0:32] + t[:, 32:64] + t[:, 64:96] + t[:, 96:128]


def _pt_st_e(zv, lane):
    """(pt, st, e): plane masks, exceed masks, exceed-count table.

    pt = butterfly planes (lane 32w + 31-p = plane p); st = within-group
    prefix-OR of pt along lanes == the smear transpose (st lane 31-b =
    "bitlen > b" bitmask, because planes sit at DESCENDING lanes so OR
    over p >= b accumulates from LOWER lanes upward); e [TR, 32] i32 =
    exceed counts in reversed column order (column 31-b = E[b])."""
    pt = _bt32_rows(zv)
    st = pt
    for d in (1, 2, 4, 8, 16):
        st = st | _shift_up_lanes(st, d, lane)
    e = _fold4(jax.lax.population_count(st).astype(jnp.int32))
    return pt, st, e


def _vertical_key(e, pw):
    """Packed (words*64 + b) FORMAT §2.2 width-selection key, [TR, 1] i32.

    Table-wide over b = 31-col, b=32 separately; min-key == argmin words
    with n_exc <= EXC_CAP, ties -> smallest b (mirrors
    vertical_xla._select_width bit-exactly)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (TR, 32), 1)
    blmax = jnp.sum(
        (e > jnp.int32(0)).astype(jnp.int32), axis=1, keepdims=True,
        dtype=jnp.int32,
    )
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
    return jnp.minimum(jnp.min(key_t, axis=1, keepdims=True), key32)


def _totals_cols(zv, n, pw, lane, k_max):
    """Shared v3 body: masked z tile -> k_max+2 output columns.

    zv: [TR, 128] u32 with invalid lanes zeroed; n: [TR, 1] i32 valid
    count; pw: [TR, 1] i32 plane words. Returns list of [TR, 1]/[TR, *]
    pieces: k_max+1 exact rice totals then the exact vertical word count.
    Tables are [TR, 32] in REVERSED plane order: column 31-p holds plane p
    (where the natural-order butterfly lands it)."""
    pt, st, e = _pt_st_e(zv, lane)
    q = _fold4(jax.lax.population_count(pt).astype(jnp.int32))

    # joint counts rcw_j[31-p] = #{bit p set AND bitlen > p+(4-j)}:
    # st plane p+D sits D lanes BELOW plane p, so shift st UP by D.
    D_t = None
    R_t = None
    for j in range(4):
        st_sh = _shift_up_lanes(st, 4 - j, lane)
        rc = _fold4(
            jax.lax.population_count(pt & st_sh).astype(jnp.int32)
        )
        d = _shift_hi(q, j) << jnp.int32(j)
        D_t = d if D_t is None else D_t + d
        r = _shift_hi(rc, j) << jnp.int32(j)
        R_t = r if R_t is None else R_t + r
    E4_t = _shift_hi(e, 4)
    col = jax.lax.broadcasted_iota(jnp.int32, (TR, 32), 1)
    kp1 = jnp.int32(32) - col  # k+1 at column 31-k
    t_t = (
        jnp.int32(MAX_CODE_BITS) * E4_t + kp1 * (n - E4_t) + D_t - R_t
    )
    cols = [t_t[:, 31 - k : 32 - k] for k in range(k_max + 1)]
    # exact vertical word count from the same e table
    cols.append(_vertical_key(e, pw) >> jnp.int32(6))
    return cols


def _bp_kernel(z_ref, cnt_ref, pw_ref, out_ref, *, k_max):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    cnt = cnt_ref[:, :]
    zv = jnp.where(lane < cnt, z_ref[:, :], jnp.uint32(0))
    out_ref[:, :] = jnp.concatenate(
        _totals_cols(zv, cnt, pw_ref[:, :], lane, k_max), axis=1
    )


def _zigzag32(r):
    return (r.astype(jnp.uint32) << jnp.uint32(1)) ^ (
        r >> jnp.int32(31)
    ).astype(jnp.uint32)


def _xbp_kernel(x_ref, prev_ref, cnt_ref, pw_ref, out_ref, *, k_max):
    """DELTA + DOUBLE_DELTA totals from raw sample rows, in-register.

    prev_ref: [TR, 2] = (x_{-1}, x_{-2}) of each row (cross-row samples,
    from history for each block's first row). Residual arithmetic wraps
    in int32 exactly like predict.residuals_for_candidate."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    cnt = cnt_ref[:, :]
    pw = pw_ref[:, :]
    x = x_ref[:, :]
    p1 = prev_ref[:, 0:1]
    p2 = prev_ref[:, 1:2]
    r1 = pltpu.roll(x, jnp.int32(1), axis=1)   # r1[l] = x[l-1]
    x1 = jnp.where(lane == jnp.int32(0), p1, r1)
    r2 = pltpu.roll(x, jnp.int32(2), axis=1)   # r2[l] = x[l-2]
    x2 = jnp.where(
        lane == jnp.int32(0), p2,
        jnp.where(lane == jnp.int32(1), p1, r2),
    )
    d = x - x1
    dd = d - (x1 - x2)
    valid = lane < cnt
    cols = []
    for r in (d, dd):
        zv = jnp.where(valid, _zigzag32(r), jnp.uint32(0))
        cols.extend(_totals_cols(zv, cnt, pw, lane, k_max))
    out_ref[:, :] = jnp.concatenate(cols, axis=1)


def _row_meta(lead, n, block_len):
    """Shared wrapper plumbing: (R, cnt [R,1], pw [R,1], subs)."""
    from dctpu.constants import sub_caps, subs_per_block

    subs = subs_per_block(block_len)
    R = int(np.prod(lead, dtype=np.int64)) * subs if lead else subs
    sub_start = jnp.arange(subs, dtype=jnp.int32) * SUB_BLOCK
    cnt = jnp.clip(
        jnp.asarray(n).astype(jnp.int32)[..., None] - sub_start,
        0, SUB_BLOCK,
    ).reshape(R, 1)
    pw_row = jnp.asarray(
        np.array([(c + 31) // 32 for c in sub_caps(block_len)], np.int32)
    )
    pw = jnp.broadcast_to(
        pw_row[None, :], lead + (subs,) if lead else (subs,)
    ).reshape(R, 1)
    return R, cnt, pw, subs


def _pad_rows(arrs, R):
    Rp = (R + TR - 1) // TR * TR
    if Rp == R:
        return arrs, Rp
    return [jnp.pad(a, ((0, Rp - R), (0, 0))) for a in arrs], Rp


def _reduce_out(out, R, lead, subs, k_max, ncand=1):
    per_sub = out[:R].reshape(lead + (subs, ncand, k_max + 2))
    totals = jnp.moveaxis(
        per_sub[..., : k_max + 1].sum(axis=-3, dtype=jnp.int32), -2, 0
    )  # [ncand, ..., k_max+1]
    vwords = jnp.moveaxis(
        per_sub[..., k_max + 1].sum(axis=-2, dtype=jnp.int32), -1, 0
    )  # [ncand, ...]
    return totals, vwords


def adaptive_totals_bp(
    z: jnp.ndarray,   # [..., L] u32 zigzag values (garbage ok past n)
    n: jnp.ndarray,   # [...] i32 valid counts
    block_len: int,
    k_max: int,
    interpret: bool | None = None,
):
    """(rice_totals [..., k_max+1] i32, vertical_words [...] i32).

    Same contract and bit-identical results as
    select_pallas.adaptive_totals_pallas (tests/test_select_bp.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert k_max < 28 and k_max + 4 <= 31
    assert block_len * MAX_CODE_BITS < 2**26  # packed-key bound (choose_k)
    L = block_len
    lead = z.shape[:-1]
    R, cnt, pw, subs = _row_meta(lead, n, L)
    pad = subs * SUB_BLOCK - L
    if pad:
        z = jnp.pad(z, [(0, 0)] * len(lead) + [(0, pad)])
    z_rows = z.reshape(R, SUB_BLOCK)
    (z_rows, cnt, pw), Rp = _pad_rows([z_rows, cnt, pw], R)

    K2 = k_max + 2
    out = pl.pallas_call(
        functools.partial(_bp_kernel, k_max=k_max),
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
    totals, vwords = _reduce_out(out, R, lead, subs, k_max)
    return totals[0], vwords[0]


def adaptive_totals_xbp(
    x: jnp.ndarray,        # [..., L] i32 raw samples (garbage ok past n)
    history: jnp.ndarray,  # [..., >=2] i32 pre-block history
    n: jnp.ndarray,        # [...] i32 valid counts
    block_len: int,
    k_max: int,
    interpret: bool | None = None,
):
    """DELTA + DOUBLE_DELTA joint totals from ONE read of x.

    Returns (totals [2, ..., k_max+1] i32, vwords [2, ...] i32) with
    candidate axis order (DELTA, DOUBLE_DELTA) — bit-identical to
    adaptive_totals_bp on each candidate's zigzag residuals."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert k_max < 28 and k_max + 4 <= 31
    assert block_len * MAX_CODE_BITS < 2**26  # packed-key bound (choose_k)
    L = block_len
    lead = x.shape[:-1]
    R, cnt, pw, subs = _row_meta(lead, n, L)
    pad = subs * SUB_BLOCK - L
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
    x_rows = x.reshape(R, SUB_BLOCK)
    # per-row cross-row prev samples: rows s>0 read the tail of row s-1,
    # row 0 of each block reads history[..., 0:2]
    xr = x.reshape(lead + (subs, SUB_BLOCK))
    h = jnp.asarray(history).astype(jnp.int32)
    p1 = jnp.concatenate(
        [h[..., 0:1], xr[..., :-1, SUB_BLOCK - 1]], axis=-1
    ).reshape(R, 1)
    p2 = jnp.concatenate(
        [h[..., 1:2], xr[..., :-1, SUB_BLOCK - 2]], axis=-1
    ).reshape(R, 1)
    prev = jnp.concatenate([p1, p2], axis=1)  # [R, 2]
    (x_rows, prev, cnt, pw), Rp = _pad_rows([x_rows, prev, cnt, pw], R)

    K2 = k_max + 2
    out = pl.pallas_call(
        functools.partial(_xbp_kernel, k_max=k_max),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 2), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, 2 * K2), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 2 * K2), jnp.int32),
        interpret=interpret,
    )(x_rows, prev, cnt, pw)
    return _reduce_out(out, R, lead, subs, k_max, ncand=2)

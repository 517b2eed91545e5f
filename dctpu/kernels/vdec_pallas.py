"""VMEM-resident VERTICAL decode mega-kernel (VERDICT r5 #4).

The XLA decoder (vertical_xla.decode_vertical) is pass-bound like the r4
emit: the b-dependent tail extraction, plane un-transposes and the
[B, S, 128, EXC_CAP] one-hot exception patch each materialize full-size
intermediates (dec_vertical 57 ms of the 73 ms adaptive decode pipeline
at 128 MiB; roofline v_stage/v_dec frac ~0.04). This kernel reconstructs
z rows in ONE VMEM pass over the staged packed regions:

  planes    — bitrev + natural-order butterfly (select_bp._bt32_rows) on
              the p-major plane lanes relayouted to butterfly order by a
              PURE XLA reshape/swap/reverse (no arithmetic producers —
              the r4 operand-fusion incident involved arithmetic chains;
              pure relayouts were measured safe, select_bp.py);
  tail      — an in-kernel funnel barrel over the REGION_PAD-word region
              extracts the 20-word tail at word 4*b (all-pw=4 geometry;
              other geometries fall back to the XLA decoder);
  vals      — raw layout direct, bit-planed layout unplaned by a
              16-word (32-plane) shift-or loop;
  patch     — 16 one-hot lane compares (positions are distinct in a
              sub-block, so OR == sum as in the XLA patch).

Zero-staging contract (vertical_xla.decode_vertical docstring): words
at/after each sub's live count are zero, so funnel overshoot and val
words past the live count need no masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import SUB_BLOCK, subs_per_block, sync_words
from dctpu.kernels.select_bp import TR, _bt32_rows, _pad_rows
from dctpu.kernels.vemit_pallas import _bitrev32
from dctpu.kernels.vertical_xla import REGION_PAD

_I0 = np.int32(0)


def _funnel_down(lo, hi, s_bits, lane):
    """[lo | hi] 256-lane funnel shifted down by a per-row dynamic amount.

    s_bits: [TR, 1] i32 shift in [0, 128], decomposed over stage sizes
    (4..128) — callers guarantee s is a multiple of 4. Returns the new lo
    (lanes [s, s+128) of the original pair)."""
    for k in (4, 8, 16, 32, 64):
        cond = (s_bits & jnp.int32(k)) != jnp.int32(0)
        rl = pltpu.roll(lo, jnp.int32(128 - k), axis=1)
        rh = pltpu.roll(hi, jnp.int32(128 - k), axis=1)
        edge = lane < jnp.int32(128 - k)
        nlo = jnp.where(edge, rl, rh)
        nhi = jnp.where(edge, rh, jnp.uint32(0))
        lo = jnp.where(cond, nlo, lo)
        hi = jnp.where(cond, nhi, hi)
    cond = (s_bits & jnp.int32(128)) != jnp.int32(0)
    return jnp.where(cond, hi, lo)


def _barrel_down_small(x, s, lane):
    """x shifted down by per-row s in [0, 4] (bits 0..2), zero fill."""
    for k in (1, 2, 4):
        cond = (s & jnp.int32(k)) != jnp.int32(0)
        sh = jnp.where(
            lane < jnp.int32(128 - k),
            pltpu.roll(x, jnp.int32(128 - k), axis=1),
            jnp.uint32(0),
        )
        x = jnp.where(cond, sh, x)
    return x


def _vdec_kernel(planes_ref, span_ref, entry_ref, z_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    entry = entry_ref[:, :]
    b = entry & jnp.int32(0x3F)
    n_exc = (entry >> jnp.int32(6)) & jnp.int32(0x1F)
    e = jnp.where(
        n_exc > jnp.int32(0),
        ((entry >> jnp.int32(11)) & jnp.int32(0x1F)) + jnp.int32(1),
        jnp.int32(0),
    )

    # ---- planes -> z (bitrev + butterfly; plane p sits at lane 32w+31-p)
    p_of_lane = jnp.int32(31) - (lane & jnp.int32(31))
    pv = jnp.where(p_of_lane < b, planes_ref[:, :], jnp.uint32(0))
    z = _bt32_rows(_bitrev32(pv))

    # ---- tail: 20 words at word 4*b of the region ----
    lo = span_ref[:, :SUB_BLOCK]
    hi = jnp.concatenate(
        [
            span_ref[:, SUB_BLOCK:REGION_PAD],
            jnp.zeros((TR, 2 * SUB_BLOCK - REGION_PAD), jnp.uint32),
        ],
        axis=1,
    )
    tail = _funnel_down(lo, hi, b * jnp.int32(4), lane)
    posw = (n_exc + jnp.int32(3)) // jnp.int32(4)
    valw = _barrel_down_small(tail, posw, lane)  # val words at lanes 0..15

    # ---- exception values: raw layout direct, planed unpacked ----
    raw_layout = n_exc <= (e + jnp.int32(1)) // jnp.int32(2)
    lane5 = lane & jnp.int32(31)
    planed = jnp.zeros((TR, SUB_BLOCK), jnp.uint32)
    for w in range(16):  # value words w hold planes 2w (lo16) / 2w+1 (hi16)
        vw_b = valw[:, w : w + 1]
        planed = planed | (
            ((vw_b & jnp.uint32(0xFFFF)) >> lane5.astype(jnp.uint32))
            & jnp.uint32(1)
        ) << jnp.uint32(2 * w)
        planed = planed | (
            ((vw_b >> jnp.uint32(16)) >> lane5.astype(jnp.uint32))
            & jnp.uint32(1)
        ) << jnp.uint32(2 * w + 1)
    vals = jnp.where(raw_layout, valw, planed)  # rank-j value at lane j

    # ---- patch: one-hot scatter of <=16 distinct positions ----
    bm = jnp.minimum(b, jnp.int32(31)).astype(jnp.uint32)
    for j in range(16):
        pos_j = (
            tail[:, j // 4 : j // 4 + 1]
            >> jnp.uint32(8 * (j % 4))
        ) & jnp.uint32(0xFF)
        val_j = vals[:, j : j + 1]
        hit = (
            (lane == pos_j.astype(jnp.int32))
            & (jnp.int32(j) < n_exc)
            & (b < jnp.int32(32))
        )
        z = z | jnp.where(hit, val_j << bm, jnp.uint32(0))
    z_ref[:, :] = z


def decode_vertical_mega(
    payload: jnp.ndarray,  # [B, SW + SUBS*REGION_PAD] staged packed rows
    n: jnp.ndarray,        # [B] i32
    block_len: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """z [B, L] u32 (zeros past n) — bit-identical to
    vertical_xla.decode_vertical on all-pw=4 geometry (block_len % 128
    == 0; callers fall back to the XLA decoder otherwise)."""
    assert block_len % SUB_BLOCK == 0, "mega decode needs all-pw=4 subs"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = payload.shape[0]
    subs = subs_per_block(block_len)
    SW = sync_words(block_len)
    L = block_len
    R = B * subs

    sync = payload[:, :SW]
    lo16 = (sync & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi16 = (sync >> jnp.uint32(16)).astype(jnp.int32)
    entry = (
        jnp.stack([lo16, hi16], axis=2).reshape(B, -1)[:, :subs]
        .reshape(R, 1)
    )
    span = payload[:, SW:].reshape(R, REGION_PAD)
    # p-major plane lanes -> butterfly order (lane 32w + 31-p): a PURE
    # relayout (reshape/swap/reverse only — no arithmetic producers)
    planes_bf = (
        span[:, : 4 * 32].reshape(R, 32, 4).swapaxes(1, 2)[..., ::-1]
        .reshape(R, 128)
    )
    (span, planes_bf, entry), Rp = _pad_rows([span, planes_bf, entry], R)

    z_rows = pl.pallas_call(
        _vdec_kernel,
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, REGION_PAD), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, SUB_BLOCK), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, SUB_BLOCK), jnp.uint32),
        interpret=interpret,
    )(planes_bf, span, entry)

    z = z_rows[:R].reshape(B, subs * SUB_BLOCK)[:, :L]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    return jnp.where(valid, z, jnp.uint32(0))

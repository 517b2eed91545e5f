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


def _totals_kernel(z_ref, cnt_ref, out_ref, *, k_max):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, SUB_BLOCK), 1)
    z = z_ref[:, :]
    valid = lane < cnt_ref[:, :]
    cols = []
    for k in range(k_max + 1):
        q4 = ((z >> jnp.uint32(k)) & jnp.uint32(15)).astype(jnp.int32)
        esc = (z >> jnp.uint32(k + 4)) != jnp.uint32(0)
        ln = jnp.where(esc, jnp.int32(MAX_CODE_BITS), q4 + jnp.int32(k + 1))
        ln = jnp.where(valid, ln, jnp.int32(0))
        cols.append(jnp.sum(ln, axis=1, keepdims=True, dtype=jnp.int32))
    out_ref[:, :] = jnp.concatenate(cols, axis=1)


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

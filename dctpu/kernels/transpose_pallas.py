"""In-kernel grouped 32x32 bit-matrix transpose (round-5 cornerstone).

bench/mosaic_probe4.py established that clz/popcount lower bit-exactly in
Pallas on this platform, which makes the choose_k_planes bit-plane
formulation viable ENTIRELY IN VMEM — eliminating the per-k/per-b lane
reductions that dominate the adaptive selection kernel (94 ms of the
154 ms adaptive encode pipeline; SURVEY §11 round-5 gap #1). The missing
primitive was the 32x32 bit transpose on [TR, 128] tiles: the XLA version
(vertical_xla.bit_transpose32) reshapes to (..., 4, 32) and rolls along
the minor 32-axis, but a Pallas kernel only has the flat 128-lane axis and
pltpu.roll rotates across group boundaries.

grouped_roll emulates a within-32-lane-group rotation with two full-width
pltpu.rolls and a lane-id select; the input/output lane reversal of the
butterfly (a permutation no Mosaic op provides) is hoisted OUT of the
kernel: callers pre/post-reverse in XLA (cheap, fuses into producers), or
simply index planes through REV32 (out lane 32w + (31-p) holds plane p).

bit_transpose32_rows(rows) here is the kernel-compatible butterfly body:
    rev(bit_transpose32_rows(rev(x))) == bit_transpose32(x)
with rev = within-group lane reversal; verified bit-exactly against the
XLA transpose in tests/test_transpose_pallas.py (interpret mode) so the
round-5 kernel can build on it without re-deriving the index algebra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I0 = np.int32(0)

# plane p of word-group w lands at lane 32*w + REV32[p] (see module doc)
REV32 = tuple(31 - p for p in range(32))


def grouped_roll(x: jnp.ndarray, j: int, lane: jnp.ndarray) -> jnp.ndarray:
    """Rotate each 32-lane group of x by j (toward higher lanes; j may be
    negative). lane: broadcasted_iota of x's shape along the lane axis.

    pltpu.roll rotates the whole 128-lane axis; lanes that wrapped across
    a group boundary instead take the value from the complementary roll
    (j - 32 or j + 32), which lands the correct same-group element there.
    """
    jm = j % 32
    if jm == 0:
        return x
    a = pltpu.roll(x, jnp.int32(jm), axis=1)
    # jm-32 over the 128-lane axis, expressed positively: a negative
    # amount SIGABRTs this Mosaic's dynamic_rotate (measured r4)
    b = pltpu.roll(x, jnp.int32(jm + 96), axis=1)
    # after roll by jm, lane l holds x[l - jm]: correct iff l%32 >= jm
    return jnp.where((lane & jnp.int32(31)) >= jnp.int32(jm), a, b)


def bit_transpose32_rows(x: jnp.ndarray, lane: jnp.ndarray) -> jnp.ndarray:
    """Butterfly body of the 32x32 bit transpose on [TR, 128] u32 tiles.

    Operates on within-group REVERSED lane order (module doc): for input
    rows xr with xr[:, 32w + 31-c] = z-word of sample 32w+c, the output or
    has or[:, 32w + 31-p] = plane-p bitmask of group w (bit c = sample c).
    Mirrors vertical_xla.bit_transpose32's masked-butterfly stages with
    grouped_roll instead of minor-axis jnp.roll.
    """
    masks = (0x0000FFFF, 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)
    j = 16
    for m in masks:
        mu = jnp.uint32(m)
        upper = (lane & jnp.int32(j)) == jnp.int32(0)
        pd = grouped_roll(x, -j, lane)
        pu = grouped_roll(x, j, lane)
        sh = jnp.uint32(j)
        t_up = (x ^ (pd >> sh)) & mu
        t_low = (pu ^ (x >> sh)) & mu
        x = jnp.where(upper, x ^ t_up, x ^ (t_low << sh))
        j >>= 1
    return x


def _transpose_kernel(x_ref, o_ref, *, tr):
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 1)
    o_ref[:, :] = bit_transpose32_rows(x_ref[:, :], lane)


def grouped_bit_transpose32(
    rows: jnp.ndarray,  # [R, 128] u32, within-group lane-REVERSED input
    interpret: bool | None = None,
    tr: int = 256,
) -> jnp.ndarray:
    """Standalone pallas_call wrapper (the r5 kernel will inline the body)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = rows.shape[0]
    Rp = (R + tr - 1) // tr * tr
    if Rp != R:
        rows = jnp.pad(rows, ((0, Rp - R), (0, 0)))
    import functools

    out = pl.pallas_call(
        functools.partial(_transpose_kernel, tr=tr),
        grid=(Rp // tr,),
        in_specs=[pl.BlockSpec((tr, 128), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, 128), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.uint32),
        interpret=interpret,
    )(rows)
    return out[:R]

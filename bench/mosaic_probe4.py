"""Mosaic op-menu probe #4 (r4): clz + popcount inside Pallas kernels.

Both LOWER and are bit-exact on this platform (verified on chip
2026-08-21). Consequence for the round-5 select-kernel rewrite
(SURVEY §11 gap #1): the per-k/per-b lane reductions that dominate
adaptive_totals_pallas (94 ms of the 154 ms adaptive encode pipeline) can
be replaced by the choose_k_planes bit-plane formulation ENTIRELY
IN-VMEM — one 32x32 butterfly transpose of z and of smear(z) (pltpu.roll
static stages, proven in-kernel), then every per-k total and every
exceed count comes from popcounts of the plane words plus 4-way adds:
no log-tree lane reductions at all.

Run on the TPU: python bench/mosaic_probe4.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_I0 = np.int32(0)


def main():
    x = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 2**32, size=(64, 128), dtype=np.uint64
        ).astype(np.uint32)
    )

    def try_op(name, kern, ref):
        try:
            out = pl.pallas_call(
                kern, grid=(1,),
                in_specs=[pl.BlockSpec((64, 128), lambda i: (_I0, _I0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((64, 128), lambda i: (_I0, _I0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
            )(x)
            ok = np.array_equal(np.asarray(out), ref)
            print(f"{name}: LOWERS, bit-exact={ok}")
        except Exception as e:
            print(f"{name}: FAILS ({type(e).__name__}: {str(e)[:200]})")

    xs = np.asarray(x)
    try_op(
        "clz(u32 as i32)",
        lambda i_ref, o_ref: o_ref.__setitem__(
            (slice(None), slice(None)),
            jax.lax.clz(i_ref[:, :].astype(jnp.int32)),
        ),
        np.where(
            xs == 0, 32,
            31 - np.floor(np.log2(np.maximum(xs, 1))).astype(np.int64),
        ).astype(np.int32),
    )
    try_op(
        "population_count(u32)",
        lambda i_ref, o_ref: o_ref.__setitem__(
            (slice(None), slice(None)),
            jax.lax.population_count(i_ref[:, :]).astype(jnp.int32),
        ),
        np.array([bin(v).count("1") for v in xs.ravel()],
                 dtype=np.int32).reshape(xs.shape),
    )


if __name__ == "__main__":
    main()

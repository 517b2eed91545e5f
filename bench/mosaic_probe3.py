"""Mosaic op-menu probe #3 (r4): int64 arithmetic inside Pallas kernels.

Decides the fused selection-kernel design: deriving the LPC candidates
in-kernel needs the Q16 wrap-i64 accumulation (predict.lpc_predict_encode).
If s64 multiply + arithmetic shift lower on this Mosaic, the fused kernel
can read x once and derive all candidates in VMEM; otherwise products must
be emulated in u32 pairs (mulhi via 16-bit splits).

Run on the TPU: python bench/mosaic_probe3.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TR = 64
_I0 = np.int32(0)


def main():
    C = 98304  # Q16 coefficient 1.5

    def kern(x_ref, o_ref):
        x = x_ref[:, :].astype(jnp.int64)
        acc = jnp.int64(C) * x + jnp.int64(-32768) * pltpu.roll(
            x, jnp.int32(1), axis=1
        )
        o_ref[:, :] = (acc >> jnp.int64(16)).astype(jnp.int32)

    x = jnp.asarray(
        np.random.default_rng(0).integers(-(2**30), 2**30, size=(TR, 128),
                                          dtype=np.int32)
    )
    try:
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((TR, 128), lambda i: (_I0, _I0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, 128), lambda i: (_I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TR, 128), jnp.int32),
        )(x)
        got = np.asarray(out)
        xs = np.asarray(x).astype(np.int64)
        want = (
            (C * xs + -32768 * np.roll(xs, 1, axis=1)) >> 16
        ).astype(np.int32)
        ok = np.array_equal(got, want)
        print(f"s64 mul+shift in Pallas: LOWERS, bit-exact={ok}")
    except Exception as e:
        print(f"s64 mul+shift in Pallas: FAILS ({type(e).__name__}: "
              f"{str(e)[:300]})")


if __name__ == "__main__":
    main()

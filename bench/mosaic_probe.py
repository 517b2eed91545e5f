"""Mosaic lowering probes: which ops the TPU Pallas compiler accepts here.

The round-1 Pallas pack/unpack failed to lower (scalar read-modify-OR
stores). The round-2 redesign needs a specific op menu; each probe compiles
and runs one candidate op so the kernel design can be chosen on facts.

Run on the real TPU: PYTHONPATH=. python bench/mosaic_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, kernel, out_shape, args, grid=None, scratch=()):
    try:
        call = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            scratch_shapes=list(scratch),
            **({"grid": grid} if grid else {}),
        )
        out = jax.jit(call)(*args)
        np.asarray(out)
        print(f"{name}: OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    x = jnp.arange(8 * 256, dtype=jnp.uint32).reshape(8, 256)
    big = jnp.arange(64 * 128, dtype=jnp.uint32).reshape(64, 128)

    # 1. strided sublane slice (even/odd node split)
    def k_stride(x_ref, o_ref):
        o_ref[:, :] = x_ref[0::2, :] + x_ref[1::2, :]

    _run("stride2-sublane", k_stride,
         jax.ShapeDtypeStruct((32, 128), jnp.uint32), (big,))

    # 2. middle-axis static index after reshape
    def k_mid(x_ref, o_ref):
        v = x_ref[:, :].reshape(32, 2, 128)
        o_ref[:, :] = v[:, 0, :] + v[:, 1, :]

    _run("reshape-mid-index", k_mid,
         jax.ShapeDtypeStruct((32, 128), jnp.uint32), (big,))

    # 3. static lane roll (jnp.roll)
    def k_roll(x_ref, o_ref):
        o_ref[:, :] = jnp.roll(x_ref[:, :], 3, axis=1)

    _run("static-lane-roll", k_roll,
         jax.ShapeDtypeStruct((8, 256), jnp.uint32), (x,))

    # 4. dynamic lane roll (traced shift)
    def k_droll(x_ref, o_ref):
        s = x_ref[0, 0].astype(jnp.int32) % 7
        o_ref[:, :] = pltpu.roll(x_ref[:, :], s, axis=1)

    _run("dynamic-lane-roll", k_droll,
         jax.ShapeDtypeStruct((8, 256), jnp.uint32), (x,))

    # 5. lane-axis reduction to sublanes
    def k_red(x_ref, o_ref):
        o_ref[:, :] = jnp.sum(x_ref[:, :], axis=1, keepdims=True)

    _run("lane-reduce", k_red,
         jax.ShapeDtypeStruct((8, 1), jnp.uint32), (x,))

    # 6. dynamic fori_loop trip count
    def k_dynloop(x_ref, o_ref):
        n = (x_ref[0, 1].astype(jnp.int32) % 5) + 1

        def body(i, acc):
            return acc + x_ref[:, :]

        o_ref[:, :] = jax.lax.fori_loop(0, n, body, jnp.zeros_like(x_ref))

    _run("dynamic-fori", k_dynloop,
         jax.ShapeDtypeStruct((8, 256), jnp.uint32), (x,))

    # 7. dynamic sublane-offset store (pl.ds with traced start)
    def k_dynstore(x_ref, o_ref):
        o_ref[:, :] = jnp.zeros_like(o_ref)
        s = x_ref[0, 0].astype(jnp.int32) % 8
        o_ref[pl.ds(s, 8), :] = x_ref[:, :]

    _run("dyn-sublane-store", k_dynstore,
         jax.ShapeDtypeStruct((16, 256), jnp.uint32), (x,))

    # 8. dynamic sublane-offset read
    def k_dynread(x_ref, o_ref):
        s = x_ref[0, 0].astype(jnp.int32) % 32
        o_ref[:, :] = x_ref[pl.ds(s, 8), :]

    _run("dyn-sublane-read", k_dynread,
         jax.ShapeDtypeStruct((8, 128), jnp.uint32), (big,))

    # 9. cumsum along lanes
    def k_cumsum(x_ref, o_ref):
        o_ref[:, :] = jnp.cumsum(x_ref[:, :], axis=1)

    _run("lane-cumsum", k_cumsum,
         jax.ShapeDtypeStruct((8, 256), jnp.uint32), (x,))

    # 10. 3-D scratch + static middle indexing
    def k_3d(x_ref, o_ref, scr):
        scr[:, :, :] = x_ref[:, :].reshape(8, 2, 128)
        o_ref[:, :] = scr[:, 0, :] + scr[:, 1, :]

    _run("3d-scratch", k_3d,
         jax.ShapeDtypeStruct((8, 128), jnp.uint32), (x,),
         scratch=(pltpu.VMEM((8, 2, 128), jnp.uint32),))

    # 10b. strided LANE slice (even/odd node split, nodes-on-lanes layout)
    def k_lstride(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, 0::2] + x_ref[:, 1::2]

    _run("stride2-lane", k_lstride,
         jax.ShapeDtypeStruct((8, 128), jnp.uint32), (x,))

    # 10c. minor-most pair extraction after reshape (lane pairs)
    def k_lpair(x_ref, o_ref):
        v = x_ref[:, :].reshape(8, 128, 2)
        o_ref[:, :] = v[:, :, 0] + v[:, :, 1]

    _run("lane-pair-reshape", k_lpair,
         jax.ShapeDtypeStruct((8, 128), jnp.uint32), (x,))

    # 10d. sublane->lane transpose
    def k_tr(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    _run("transpose-64x128", k_tr,
         jax.ShapeDtypeStruct((128, 64), jnp.uint32), (big,))

    # 10e. dynamic fori carrying a growing-free VMEM scratch update
    def k_scrloop(x_ref, o_ref, scr):
        scr[:, :] = x_ref[:, :]

        def body(i, _):
            scr[:, :] = scr[:, :] + jnp.uint32(1)
            return 0

        jax.lax.fori_loop(0, 4, body, 0)
        o_ref[:, :] = scr[:, :]

    _run("scratch-loop", k_scrloop,
         jax.ShapeDtypeStruct((8, 256), jnp.uint32), (x,),
         scratch=(pltpu.VMEM((8, 256), jnp.uint32),))

    # 11. grid + VMEM blockspec sanity (the round-1 failure shape)
    def k_grid(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * jnp.uint32(2)

    try:
        out = pl.pallas_call(
            k_grid,
            grid=(8,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.uint32),
        )(big)
        np.asarray(out)
        print("grid-vmem: OK")
    except Exception as e:
        print(f"grid-vmem: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

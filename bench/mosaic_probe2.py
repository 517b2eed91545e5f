"""Mosaic lowering probes, round 2: ops needed by the scan-style pack/unpack.

Probe 1 results (bench/mosaic_probe.py, TPU v5e via axon, 2026-08-20):
  OK:   stride2-sublane, reshape-mid-index, static-lane-roll,
        dynamic-lane-roll (pltpu.roll, traced shift), dynamic-fori,
        dyn-sublane-read (pl.ds traced start), 3d-scratch, transpose-64x128,
        scratch-loop, grid-vmem
  FAIL: lane-reduce over UNSIGNED ints (signed works), dyn-sublane-store,
        lane-cumsum (jnp.cumsum unimplemented), stride2-lane,
        lane-pair-reshape

This round probes the exact shapes the two-stage Rice pack needs:
3-D VMEM state [8, 32, UB], grid-carried scratch (sequential TPU grid),
reverse index maps, per-step middle-axis input blocks, elementwise
popcount/clz, and strided middle-axis slicing of 3-D arrays.

Run on the real TPU: PYTHONPATH=. python bench/mosaic_probe2.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"{name}: OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    print("device:", jax.devices()[0], file=sys.stderr)

    # A. 3-D elementwise funnel on [8, 32, 64] + static minor slice/concat
    def k_funnel3d(x_ref, s_ref, o_ref):
        buf = x_ref[:, :, :]
        s = s_ref[:, :, :].astype(jnp.uint32)  # [8, 32, 1]
        zero = jnp.zeros_like(buf[:, :, :1])
        up = jnp.concatenate([zero, buf[:, :, :-1]], axis=2)
        o_ref[:, :, :] = (buf << s) | jnp.where(
            s == 0, jnp.uint32(0), up >> ((jnp.uint32(32) - s) & jnp.uint32(31))
        )

    x3 = jnp.arange(8 * 32 * 64, dtype=jnp.uint32).reshape(8, 32, 64)
    s3 = (jnp.arange(8 * 32, dtype=jnp.int32).reshape(8, 32, 1)) % 31
    run("funnel-3d", lambda: pl.pallas_call(
        k_funnel3d,
        out_shape=jax.ShapeDtypeStruct((8, 32, 64), jnp.uint32),
    )(x3, s3))

    # B. grid-carried scratch accumulation: sequential TPU grid + reverse map
    def k_gridcarry(x_ref, o_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:, :] = jnp.zeros_like(acc)

        acc[:, :] = acc[:, :] * jnp.uint32(3) + x_ref[0, :, :]

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            o_ref[:, :] = acc[:, :]

    xg = jnp.arange(16 * 8 * 128, dtype=jnp.uint32).reshape(16, 8, 128)

    def gridcarry():
        out = pl.pallas_call(
            k_gridcarry,
            grid=(16,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda t: (15 - t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.uint32)],
        )(xg)
        # reference: reversed-order horner accumulation
        ref = jnp.zeros((8, 128), jnp.uint32)
        for t in range(16):
            ref = ref * jnp.uint32(3) + xg[15 - t]
        assert np.array_equal(np.asarray(out), np.asarray(ref)), "mismatch"
        return out

    run("grid-carried-scratch-reverse", gridcarry)

    # C. 2-grid (blocks x steps) with per-(i,t) input block and carry scratch
    def k_grid2(x_ref, o_ref, acc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc[:, :, :] = jnp.zeros_like(acc)

        acc[:, :, :] = acc[:, :, :] + x_ref[:, 0, :][:, None, :]

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            o_ref[:, :, :] = acc[:, :, :]

    xh = jnp.arange(16 * 4 * 32, dtype=jnp.uint32).reshape(16, 4, 32)

    def grid2():
        out = pl.pallas_call(
            k_grid2,
            grid=(2, 4),
            in_specs=[pl.BlockSpec((8, 1, 32), lambda i, t: (i, t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 2, 32), lambda i, t: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 2, 32), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((8, 2, 32), jnp.uint32)],
        )(xh)
        ref = xh.reshape(2, 8, 4, 32).sum(axis=2, dtype=jnp.uint32)
        ref = jnp.broadcast_to(ref[:, :, None, :], (2, 8, 2, 32)).reshape(16, 2, 32)
        assert np.array_equal(np.asarray(out), np.asarray(ref)), "mismatch"
        return out

    run("grid2-carry-perstep-input", grid2)

    # D. elementwise popcount + clz on uint32 (vector, no reduce)
    def k_pop(x_ref, o_ref):
        o_ref[:, :] = (
            jax.lax.population_count(x_ref[:, :])
            + jax.lax.clz(x_ref[:, :] | jnp.uint32(1))
        )

    x2 = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    run("popcount-clz", lambda: pl.pallas_call(
        k_pop, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32))(x2))

    # E. strided middle-axis slice of 3-D [8, 32, 64] -> [8, 16, 64]
    def k_midstride(x_ref, o_ref):
        o_ref[:, :, :] = x_ref[:, 0::2, :] | x_ref[:, 1::2, :]

    run("stride2-middle-3d", lambda: pl.pallas_call(
        k_midstride,
        out_shape=jax.ShapeDtypeStruct((8, 16, 64), jnp.uint32))(x3))

    # F. signed int32 reduce over minor axis of 3-D (sub_lens in kernel)
    def k_red3(x_ref, o_ref):
        o_ref[:, :] = jnp.sum(x_ref[:, :, :].astype(jnp.int32), axis=2)

    run("3d-minor-reduce-signed", lambda: pl.pallas_call(
        k_red3, out_shape=jax.ShapeDtypeStruct((8, 32), jnp.int32))(x3))

    # G. static word roll along minor axis of 3-D via concat halves
    def k_roll3(x_ref, o_ref):
        b = x_ref[:, :, :]
        out = b
        for d in (1, 2, 4):
            shifted = jnp.concatenate(
                [jnp.zeros((8, 32, d), jnp.uint32), out[:, :, :-d]], axis=2
            )
            out = jnp.where((b[:, :, :1] & jnp.uint32(d)) != 0, shifted, out)
        o_ref[:, :, :] = out

    run("barrel-roll-3d", lambda: pl.pallas_call(
        k_roll3, out_shape=jax.ShapeDtypeStruct((8, 32, 64), jnp.uint32))(x3))

    # H. big-lane 2-D funnel: [8, 6144+16] payload-scale elementwise
    def k_big(x_ref, o_ref):
        v = x_ref[:, :]
        up = jnp.concatenate(
            [jnp.zeros((8, 1), jnp.uint32), v[:, :-1]], axis=1
        )
        o_ref[:, :] = (v << jnp.uint32(7)) | (up >> jnp.uint32(25))

    xb = jnp.arange(8 * 6160, dtype=jnp.uint32).reshape(8, 6160)
    run("big-lane-funnel", lambda: pl.pallas_call(
        k_big, out_shape=jax.ShapeDtypeStruct((8, 6160), jnp.uint32))(xb))


if __name__ == "__main__":
    main()

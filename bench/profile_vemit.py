"""Micro-profile of encode_vertical's internal stages (round-4).

The roofline shows v_emit at 36 ms vs a 1.7 ms traffic bound — this splits
it: width selection (exceed_counts + _select_width), the plane bit
transpose, exception extraction (pallas vs xla), value planing, and the
final region concat. Isolated jits over-count fused cost but rank the
stages (same caveat as bench/profile_stages.py).

Usage: python bench/profile_vemit.py [B] [L]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from dctpu.codec import api as capi, rice
    from dctpu.constants import EXC_CAP, subs_per_block, sync_words
    from dctpu.corpus import synth_corpus
    from dctpu.kernels.vertical_xla import (
        _select_width,
        _plane_word_counts,
        _sub_shape,
        bit_transpose32,
        encode_vertical,
        exc_extract_xla,
        exceed_counts,
    )
    from dctpu.kernels.vertical_pallas import exc_extract_pallas
    from dctpu.utils.timing import chained_seconds

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    raw = B * L * 4
    subs = subs_per_block(L)

    streams, _, _ = synth_corpus(16, B * L // 16, seed=123,
                                 mixed_cadence=True, cumulative_frac=0.25)
    x, n, hist, _, _ = capi.build_blocks(streams, L)
    # winner z as the encoder sees it (delta winner is typical; exactness of
    # the ranking does not depend on the predictor choice)
    z = np.zeros((B, L), np.uint32)
    d = x.astype(np.int64)
    d[:, 1:] -= x[:, :-1]
    z[:] = ((d << 1) ^ (d >> 63)).astype(np.uint32)
    zd = jax.device_put(jnp.asarray(z))
    nd = jax.device_put(jnp.asarray(n))

    def report(name, fn, args, chain=4):
        t0 = time.time()
        dt = chained_seconds(fn, args, k=chain)
        print(f"{name:34s} {dt*1e3:8.2f} ms  ({raw/dt/1e9:6.2f} GB/s in) "
              f"[{time.time()-t0:.0f}s]", flush=True)
        return dt

    pw = _plane_word_counts(L)[None, :]

    if "--full" in sys.argv:  # r5: just the full-encoder head-to-head
        enc = jax.jit(encode_vertical, static_argnames=(
            "block_len", "exc_backend"))
        # portable reference on the host CPU: the big-geometry "xla"
        # compile OOMs/stalls the axon compile helper (see tpu_smoke 1b)
        cpu = jax.devices("cpu")[0]
        zc = jax.device_put(np.asarray(zd), cpu)
        nc = jax.device_put(np.asarray(nd), cpu)
        with jax.default_device(cpu):
            p_ref, bl_ref = jax.tree.map(np.asarray, enc(zc, nc, L, "xla"))
        print("cpu reference done", flush=True)
        p, bl = jax.tree.map(np.asarray, enc(zd, nd, L, "mega"))
        assert np.array_equal(bl, bl_ref), "mega bit_len != portable"
        assert np.array_equal(p, p_ref), "mega payload != portable"
        print("mega payload bit-identical to portable reference ✓",
              flush=True)

        def full_mega(z, n, salt):
            return encode_vertical(z ^ salt, n, L, exc_backend="mega")

        report("FULL encode_vertical (mega)", full_mega, (zd, nd), chain=3)

        def full_x(z, n, salt):
            return encode_vertical(z ^ salt, n, L, exc_backend="xla")

        report("FULL encode_vertical (xla)", full_x, (zd, nd), chain=3)
        return

    def subshape(z, n, salt):
        zs, valid = _sub_shape(z ^ salt, n, L)
        return zs

    report("sub_shape (reshape+mask)", subshape, (zd, nd))

    zs0, _ = jax.jit(
        lambda z, n: _sub_shape(z, n, L)
    )(zd, nd)

    def exceed(zs, salt):
        return exceed_counts(zs ^ salt)

    report("exceed_counts", exceed, (zs0,))

    def select(zs, salt):
        return _select_width(exceed_counts(zs ^ salt), pw)

    report("exceed+select_width", select, (zs0,))

    bb0 = jax.jit(lambda zs: _select_width(exceed_counts(zs), pw)[0])(zs0)

    def transpose(zs, salt):
        zg = (zs ^ salt).reshape(B, subs, 4, 32)
        return bit_transpose32(zg)

    report("plane bit_transpose32", transpose, (zs0,))

    def exc_p(zs, bb, salt):
        return exc_extract_pallas(zs ^ salt, bb)

    report("exc_extract_pallas", exc_p, (zs0, bb0))

    def exc_x(zs, bb, salt):
        return exc_extract_xla(zs ^ salt, bb)

    report("exc_extract_xla", exc_x, (zs0, bb0))

    vals0 = jnp.zeros((B, subs, EXC_CAP), jnp.uint32)

    def vplane(vals, salt):
        vals32 = jnp.concatenate(
            [vals ^ salt, jnp.zeros((B, subs, 32 - EXC_CAP), jnp.uint32)],
            axis=2)
        return bit_transpose32(vals32)

    report("value planing", vplane, (vals0,))

    def full(z, n, salt):
        return encode_vertical(z ^ salt, n, L, exc_backend="pallas")

    report("FULL encode_vertical (pallas)", full, (zd, nd))

    def full_x(z, n, salt):
        return encode_vertical(z ^ salt, n, L, exc_backend="xla")

    report("FULL encode_vertical (xla)", full_x, (zd, nd))


if __name__ == "__main__":
    main()

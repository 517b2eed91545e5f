"""Pallas TPU bit packer: chunked prepend-scan + in-VMEM merge tree.

The north star's "blockwise Pallas pack/unpack with exclusive-scan bit
offsets" [BASELINE.json:5], in a form Mosaic can lower on this TPU. The
round-1 kernel emitted codewords with scalar read-modify-OR stores at
dynamic offsets; Mosaic has no dynamic-offset scalar stores (measured,
bench/mosaic_probe.py), so it ran interpret-only. This rewrite uses the
pack_scan schedule — every op is an elementwise u32 funnel, a static or
sublane-strided REF slice, or a whole-block store, all probed OK on this
Mosaic (bench/mosaic_probe.py, mosaic_probe2.py):

  grid (B/8, 16): step t prepends codeword 15-t of every 16-sample chunk
       into the chunk's 24-word VMEM buffer (state [8, P, 24] u32 in
       scratch, carried across the sequential TPU grid). Prepending keeps
       every append at bit 0: a 0/1-word select plus an in-word funnel.
  last step: log2(P) merge levels combine chunk buffers pairwise (funnel
       shift + barrel word roll, same math as pack_merge's tensor form).
       Each level reads its children with sublane-strided ref slices
       ([:, 0::2, :] on VALUES lowers to an unsupported 3-D gather —
       measured) and writes the next level's scratch; the last level
       writes the output block. Left-child bit lengths per level are
       precomputed in XLA (tiny arrays) because value-level lane-strided
       slices don't lower.

The whole merge pyramid lives in VMEM — the XLA twin (kernels/pack_scan.py)
materializes every scan step and merge level to HBM, ~10 GB of traffic at
the bench geometry vs ~256 MB (in + out) here.

Bit-identical to pack_xla/pack_merge/pack_scan (bit-string concatenation is
associative; cross-tested in tests/test_pallas_kernels.py). Sync table and
bit_len are computed in XLA outside the kernel.

Reference interface parity: SURVEY.md §2.1 "Bit-packer (hot)"; replaces the
serial put_bits loop of SURVEY.md §3 (encode hot loop).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctpu.constants import MAX_CODE_BITS, SUB_BLOCK, subs_per_block, sync_words
from dctpu.kernels.pack_xla import make_sync_table, padded_words

ROWS = 8    # blocks per grid program (TPU sublane tile)
CHUNK = 16  # samples per scan chunk (must match pack_scan for bit-equality)
PART_WORDS = (CHUNK * MAX_CODE_BITS + 31) // 32  # 24; CHUNK*48 % 32 == 0

# i32 zero for index maps: with jax_enable_x64 on (dctpu flips it at import),
# a bare python 0 makes the index-map return i64, which Mosaic cannot
# legalize ("failed to legalize 'func.return'" — measured on this platform)
_I0 = np.int32(0)


def _level_allocs(P: int) -> List[int]:
    """Even-padded node counts per level, level 0 (= P) .. last (> 1)."""
    allocs = []
    n = P
    while n > 1:
        n_even = n + (n & 1)
        allocs.append(n_even)
        n = n_even // 2
    return allocs


def _pack_kernel(*refs, D, P, Wbits):
    lo_ref, hi_ref, ln_ref = refs[:3]
    la_refs = refs[3 : 3 + D]
    out_ref = refs[3 + D]
    bufs = refs[4 + D :]  # D level scratches; level l has allocs[l] nodes
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for b in bufs:
            b[:, :, :] = jnp.zeros_like(b)

    lo = lo_ref[0, :, :]  # [ROWS, P]
    hi = hi_ref[0, :, :]
    ln = ln_ref[0, :, :]

    # prepend: shift buffer up by ln bits (word step 0/1 + in-word funnel),
    # then OR the codeword into words 0-1 — identical to pack_scan._prepend_step
    b = bufs[0][:, :, :]
    zero = jnp.zeros_like(b[:, :, :1])
    # minor-dim insertion must happen on the 32-bit array, not the i1 result
    # ("Insertion of minor dim ... only supported for 32-bit types" — Mosaic)
    d1 = ln[:, :, None] >= 32
    up1 = jnp.concatenate([zero, b[:, :, :-1]], axis=2)
    base = jnp.where(d1, up1, b)
    up_b = jnp.concatenate([zero, base[:, :, :-1]], axis=2)
    s = (ln & 31).astype(jnp.uint32)[:, :, None]
    shifted = (base << s) | jnp.where(
        s == 0, jnp.uint32(0), up_b >> ((jnp.uint32(32) - s) & jnp.uint32(31))
    )
    w0 = shifted[:, :, :1] | lo[:, :, None]
    w1 = shifted[:, :, 1:2] | hi[:, :, None]
    bufs[0][:, :, :] = jnp.concatenate([w0, w1, shifted[:, :, 2:]], axis=2)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        for l in range(D):
            # sublane-strided ref reads lower only while the minor dim fits
            # one lane tile ("last dim size is not 128" Mosaic error above
            # that); later levels have few nodes — use static slices there.
            W_l = bufs[l].shape[2]
            A = bufs[l].shape[1] // 2
            if W_l <= 128:
                a = bufs[l][:, 0::2, :]  # [R, A, W]
                bb = bufs[l][:, 1::2, :]
            elif A == 1:
                a = bufs[l][:, 0:1, :]
                bb = bufs[l][:, 1:2, :]
            else:
                a = jnp.concatenate(
                    [bufs[l][:, 2 * j : 2 * j + 1, :] for j in range(A)],
                    axis=1,
                )
                bb = jnp.concatenate(
                    [bufs[l][:, 2 * j + 1 : 2 * j + 2, :] for j in range(A)],
                    axis=1,
                )
            la = la_refs[l][:, :]    # [R, A] i32 left-child bit lengths
            w = a.shape[2]
            s = (la & 31).astype(jnp.uint32)[:, :, None]
            wsh = la >> 5

            # concat, not jnp.pad: pad's traced-constant path blows the
            # Python stack when tracing for Mosaic (measured on this jax)
            zw = jnp.zeros(a.shape, jnp.uint32)
            bp = jnp.concatenate([bb, zw], axis=2)  # [R, A, 2W]
            z1 = jnp.zeros_like(bp[:, :, :1])
            prev = jnp.concatenate([z1, bp[:, :, :-1]], axis=2)
            bf = jnp.where(
                s == 0,
                bp,
                (bp << s) | (prev >> ((jnp.uint32(32) - s) & jnp.uint32(31))),
            )
            d = 1
            while d <= w:
                cond = (wsh[:, :, None] & d) != 0
                sh = jnp.concatenate(
                    [jnp.zeros_like(bp[:, :, :d]), bf[:, :, :-d]], axis=2
                )
                bf = jnp.where(cond, sh, bf)
                d *= 2
            merged = jnp.concatenate([a, zw], axis=2) | bf  # [R, A, 2W]

            if l + 1 < D:
                nout = merged.shape[1]
                bufs[l + 1][:, :nout, :] = merged
            else:
                out = merged[:, 0, :]
                if out.shape[1] < Wbits:
                    out = jnp.concatenate(
                        [out, jnp.zeros((out.shape[0], Wbits - out.shape[1]),
                                        jnp.uint32)],
                        axis=1,
                    )
                else:
                    out = out[:, :Wbits]
                out_ref[:, :] = out


def _left_lens(length_p: jnp.ndarray, P: int) -> List[jnp.ndarray]:
    """Per-merge-level left-child bit lengths [B, pairs_l] (XLA, tiny)."""
    B = length_p.shape[0]
    lens = jnp.sum(
        length_p.reshape(B, P, CHUNK), axis=2, dtype=jnp.int32
    )
    out = []
    while lens.shape[1] > 1:
        if lens.shape[1] % 2:
            lens = jnp.pad(lens, ((0, 0), (0, 1)))
        la, lb = lens[:, 0::2], lens[:, 1::2]
        out.append(la)
        lens = la + lb
    return out


BATCH_ROWS = 1024  # lax.map chunk: XLA pass time on the wrapper ops grows
                   # superlinearly with B (562 s at B=8192 vs 175 s at B=16,
                   # measured); mapping fixed chunks bounds compile at any B


def pack_pallas(
    code_lo: jnp.ndarray,  # [B, L] u32
    code_hi: jnp.ndarray,  # [B, L] u32
    length: jnp.ndarray,   # [B, L] i32
    valid: jnp.ndarray,    # [B, L] bool
    block_len: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as pack_xla: (payload [B, W] incl. sync table, bit_len [B])."""
    B = code_lo.shape[0]
    if B > BATCH_ROWS:
        Bp = (B + BATCH_ROWS - 1) // BATCH_ROWS * BATCH_ROWS
        pad = ((0, Bp - B), (0, 0))

        def padto(a):
            return jnp.pad(a, pad) if Bp != B else a

        G = Bp // BATCH_ROWS

        def body(args):
            return _pack_pallas_rows(*args, block_len, interpret)

        payload, bit_len = jax.lax.map(
            body,
            tuple(
                padto(a).reshape(G, BATCH_ROWS, -1)
                for a in (code_lo, code_hi, length, valid)
            ),
        )
        return payload.reshape(Bp, -1)[:B], bit_len.reshape(Bp)[:B]
    return _pack_pallas_rows(code_lo, code_hi, length, valid, block_len,
                             interpret)


def _pack_pallas_rows(
    code_lo: jnp.ndarray,
    code_hi: jnp.ndarray,
    length: jnp.ndarray,
    valid: jnp.ndarray,
    block_len: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, L = code_lo.shape
    SW = sync_words(block_len)
    Wbits = padded_words(block_len) - SW
    subs = subs_per_block(block_len)
    Lp = subs * SUB_BLOCK
    P = Lp // CHUNK

    length = jnp.where(valid, length, 0)
    code_lo = jnp.where(valid, code_lo, jnp.uint32(0))
    code_hi = jnp.where(valid, code_hi, jnp.uint32(0))
    sync = make_sync_table(length, block_len)
    bit_len = jnp.sum(length, axis=1)

    if Lp != L:
        pad = ((0, 0), (0, Lp - L))
        code_lo = jnp.pad(code_lo, pad)
        code_hi = jnp.pad(code_hi, pad)
        length = jnp.pad(length, pad)

    # [B, P, CHUNK] -> TIME-MAJOR [CHUNK, B, P]: step t's codes are one
    # (1, ROWS, P) block whose last two dims satisfy Mosaic's (8, 128)
    # block-divisibility rule (a (ROWS, 1, P) block does not — measured,
    # bench/mosaic_probe2.py grid2 probe)
    lo_r = jnp.transpose(code_lo.reshape(B, P, CHUNK), (2, 0, 1))
    hi_r = jnp.transpose(code_hi.reshape(B, P, CHUNK), (2, 0, 1))
    ln_r = jnp.transpose(length.reshape(B, P, CHUNK), (2, 0, 1))
    las = _left_lens(length, P)
    D = len(las)
    allocs = _level_allocs(P)
    assert len(allocs) == D

    Bp = (B + ROWS - 1) // ROWS * ROWS
    if Bp != B:
        padb = ((0, 0), (0, Bp - B), (0, 0))
        lo_r = jnp.pad(lo_r, padb)
        hi_r = jnp.pad(hi_r, padb)
        ln_r = jnp.pad(ln_r, padb)
        las = [jnp.pad(la, ((0, Bp - B), (0, 0))) for la in las]

    spec = pl.BlockSpec(
        # jnp.int32 constant: with jax_enable_x64 on (dctpu flips it at
        # import), a bare python int makes the index-map return i64, which
        # Mosaic cannot legalize ("failed to legalize 'func.return'")
        (1, ROWS, P),
        lambda i, t: (np.int32(CHUNK - 1) - t, i, _I0),
        memory_space=pltpu.VMEM,
    )
    la_specs = [
        pl.BlockSpec((ROWS, la.shape[1]), lambda i, t: (i, _I0),
                     memory_space=pltpu.VMEM)
        for la in las
    ]
    data = pl.pallas_call(
        functools.partial(_pack_kernel, D=D, P=P, Wbits=Wbits),
        grid=(Bp // ROWS, CHUNK),
        in_specs=[spec, spec, spec, *la_specs],
        out_specs=pl.BlockSpec(
            (ROWS, Wbits), lambda i, t: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Wbits), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, allocs[l], PART_WORDS << l), jnp.uint32)
            for l in range(D)
        ],
        interpret=interpret,
    )(lo_r, hi_r, ln_r, *las)

    payload = jnp.concatenate([sync, data[:B]], axis=1)
    return payload, bit_len

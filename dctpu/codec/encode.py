"""Jitted block-batch encoder: [B, L] samples -> packed payloads + metadata.

The whole encode pipeline (SURVEY.md §3 E1 device section) is one jit region:
candidate residuals -> zigzag -> exact per-(candidate, k) coded-length sweep ->
per-block argmin selection -> codeword emission -> parallel bit pack. No
data-dependent shapes anywhere; selection is gather/where, not control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dctpu.codec import predict, rice
from dctpu.config import CodecConfig
from dctpu.constants import LPC
from dctpu.kernels import api as kernels


class EncodedBlocks(NamedTuple):
    predictor: jnp.ndarray  # [B] i32
    k: jnp.ndarray          # [B] i32
    table_idx: jnp.ndarray  # [B] i32
    bit_len: jnp.ndarray    # [B] i32
    payload: jnp.ndarray    # [B, W] u32


def _cand_z_fn(x, history, cands, cfg):
    """Per-candidate fused zigzag-residual pass.

    One closure instead of stacking [C, B, L]: each candidate's residual ->
    zigzag -> consumer fuses into one read of x, and the winner's z is
    re-derived with a masked accumulation that fuses into the same
    producers — the [C, B, L] arrays of round 1 (2 x 6 x input size of HBM
    traffic, round-1 VERDICT weak #6) never exist.
    """

    def f(ci):
        pred, ti = cands[ci]
        coeffs = cfg.lpc_tables[ti].coeffs if pred == LPC else None
        return rice.zigzag(
            predict.residuals_for_candidate(x, history, pred, coeffs)
        )

    return f


def _emit_selected(
    x: jnp.ndarray,        # [B, L] int32
    n: jnp.ndarray,        # [B] int32
    history: jnp.ndarray,  # [B, 4] int32
    choice: jnp.ndarray,   # [B] i32 candidate index
    k: jnp.ndarray,        # [B] i32 Rice k (ignored for vertical)
    cfg: CodecConfig,
    coder: str,            # "rice" | "vertical"
    backend: str,
) -> EncodedBlocks:
    """Shared emission half of encode: winner z -> headers -> payload.

    The ONE normative implementation of winner accumulation, header one-hot
    extraction, and coder dispatch — used by both encode_blocks_body (which
    computes `choice`/`k` itself) and emit_blocks_body (which is handed them
    by the adaptive host driver). Round-2 VERDICT weak #8: these existed
    twice and had to be kept byte-identical by hand.
    """
    B, L = x.shape
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    cands = cfg.candidates()
    cand_z = _cand_z_fn(x, history, cands, cfg)

    z = jnp.zeros((B, L), jnp.uint32)
    for ci in range(len(cands)):
        z = jnp.where((choice == ci)[:, None], cand_z(ci), z)

    pred_ids = jnp.array([p for p, _ in cands], dtype=jnp.int32)
    tidx_ids = jnp.array(
        [ti if p == LPC else 0 for p, ti in cands], dtype=jnp.int32
    )
    oh_c = (
        jnp.arange(len(cands), dtype=jnp.int32)[:, None] == choice[None, :]
    )  # [C, B]
    predictor = jnp.sum(
        jnp.where(oh_c, pred_ids[:, None], 0), axis=0, dtype=jnp.int32
    )
    table_idx = jnp.sum(
        jnp.where(oh_c, tidx_ids[:, None], 0), axis=0, dtype=jnp.int32
    )

    if coder == "vertical":
        from dctpu.kernels.vertical_xla import encode_vertical

        # backend selects the exception-extraction kernel (the only stage
        # with a Pallas fast path); everything else is shared XLA. "auto"
        # now resolves to the XLA extraction: in the r4 fused encode it
        # wins the on-chip head-to-head (1.50 vs 3.90 ms isolated, 34.1 vs
        # 36.7 ms full encode at 128 MiB — bench/profile_vemit.py; the r1
        # measurement that favored Pallas predates the fused emission,
        # where XLA re-read the sub-shaped arrays ~20x). backend="pallas"
        # still forces the Pallas kernel (bit-exact, smoke-gated via the
        # encode compile).
        exc = "xla"
        if backend.startswith("pallas"):
            exc = "pallas"
        elif backend != "xla" and jax.default_backend() == "tpu":
            # r5 production default: the VMEM-resident emit mega-kernel
            # (vemit_pallas; 19.95 vs 32.57 ms at 128 MiB on chip,
            # bit-identical — bench/profile_vemit.py --full). "xla" stays
            # the portable opt-out diffed by the smoke gate.
            exc = "mega"
        payload, bit_len = encode_vertical(z, n, L, exc_backend=exc)
        k = jnp.zeros(B, jnp.int32)
    else:
        code_lo, code_hi, length = rice.codewords(z, k[:, None])
        payload, bit_len = kernels.pack(
            code_lo, code_hi, length, valid, L, backend
        )
    return EncodedBlocks(predictor, k, table_idx, bit_len, payload)


def encode_blocks_body(
    x: jnp.ndarray,        # [B, L] int32
    n: jnp.ndarray,        # [B] int32 valid lengths
    history: jnp.ndarray,  # [B, 4] int32
    cfg: CodecConfig,
    backend: str = "auto",
) -> EncodedBlocks:
    """Traceable encode pipeline; also the per-shard body under shard_map."""
    B, L = x.shape
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]  # [B, L]
    cands = cfg.candidates()
    C = len(cands)
    cand_z = _cand_z_fn(x, history, cands, cfg)

    if cfg.coder == "vertical":
        from dctpu.kernels.vertical_xla import vertical_selection_cost

        cost_c = jnp.stack(
            [vertical_selection_cost(cand_z(ci), valid) for ci in range(C)]
        )  # [C, B]
        choice = jnp.argmin(cost_c, axis=0).astype(jnp.int32)
        k = jnp.zeros(B, jnp.int32)
    else:
        # Exact per-candidate k selection — bit-plane tables, 2 passes
        # (rice.choose_k_planes) fused per candidate.
        ks, bits = [], []
        for ci in range(C):
            k_i, bits_i = rice.choose_k_auto(
                cand_z(ci), n, L, cfg.k_max, backend
            )
            ks.append(k_i)
            bits.append(bits_i)
        k_c, bits_c = jnp.stack(ks), jnp.stack(bits)  # [C, B]
        # Candidate argmin; ties -> earliest candidate (normative order).
        choice = jnp.argmin(bits_c, axis=0).astype(jnp.int32)  # [B]
        oh = jnp.arange(C, dtype=jnp.int32)[:, None] == choice[None, :]
        k = jnp.sum(jnp.where(oh, k_c, 0), axis=0, dtype=k_c.dtype)

    return _emit_selected(x, n, history, choice, k, cfg, cfg.coder, backend)


encode_blocks = jax.jit(
    encode_blocks_body, static_argnames=("cfg", "backend")
)


# --------------------------------------------------- adaptive coder (§4.1)


def adaptive_select_body(
    x: jnp.ndarray,        # [B, L] int32
    n: jnp.ndarray,        # [B] int32
    history: jnp.ndarray,  # [B, 4] int32
    cfg: CodecConfig,
    backend: str = "auto",
):
    """FORMAT §4.1 joint (candidate, coder) selection by exact word count.

    Returns (choice [B] i32 candidate index, coder [B] i32 0=RICE/1=VERTICAL,
    k [B] i32). Option order c0-RICE, c0-VERT, c1-RICE, ... with first-wins
    argmin implements the normative tie-break.

    backend: "auto" (= "bp") uses the fused select_bp v3 Pallas totals
    kernels on TPU; "reduce" the r4 select_pallas reduction kernel;
    "xla" forces the portable formulation — the smoke gate diffs auto
    against xla on chip at production-shaped geometry (r4
    selection-miscompile incident).
    """
    from dctpu.kernels.vertical_xla import vertical_total_words

    B, L = x.shape
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    cands = cfg.candidates()
    C = len(cands)
    cand_z = _cand_z_fn(x, history, cands, cfg)

    # per-candidate fused passes — no [C, B, L] stack (see _cand_z_fn).
    # On TPU the default ("auto"/"bp") is the select_bp v3 bit-plane
    # family: DELTA/DOUBLE_DELTA totals derive in-register from ONE read
    # of x (adaptive_totals_xbp) and each LPC candidate costs one z read
    # (adaptive_totals_bp) — 47.0 ms vs 94.0 for the r4 reduction kernel
    # at 128 MiB, bit-identical (bench/profile_select.py). The r4
    # select_pallas reduction kernel remains as backend="reduce" for
    # A/B; "xla" is the portable formulation (the public kernel opt-out,
    # and the reference half of the smoke gate's production-shaped
    # divergence check — the r4 miscompile incident's lesson, see
    # select_bp.py docstring).
    use_fused = backend != "xla" and jax.default_backend() == "tpu"
    use_bp = use_fused and backend != "reduce"
    xbp_res = None
    ks, rws, vws = [], [], []
    k_axis = jnp.arange(cfg.k_max + 1, dtype=jnp.int32)
    for ci in range(C):
        if use_fused:
            from dctpu.constants import DELTA, DOUBLE_DELTA

            pred = cands[ci][0]
            if use_bp and pred in (DELTA, DOUBLE_DELTA):
                # v3 in-register candidate derivation: one x read covers
                # both shift predictors (select_bp.adaptive_totals_xbp)
                from dctpu.kernels.select_bp import adaptive_totals_xbp

                if xbp_res is None:
                    xbp_res = adaptive_totals_xbp(
                        x, history, n, L, cfg.k_max
                    )
                gi = 0 if pred == DELTA else 1
                totals, vword = xbp_res[0][gi], xbp_res[1][gi]
            else:
                if use_bp:
                    from dctpu.kernels.select_bp import (
                        adaptive_totals_bp as _tot,
                    )
                else:
                    from dctpu.kernels.select_pallas import (
                        adaptive_totals_pallas as _tot,
                    )

                totals, vword = _tot(cand_z(ci), n, L, cfg.k_max)
            key = jnp.min(totals * 32 + k_axis, axis=-1)
            k_i = (key & 31).astype(jnp.int32)
            bits_i = key >> 5
            vws.append(vword)
        else:
            z_c = cand_z(ci)
            k_i, bits_i = rice.choose_k_auto(z_c, n, L, cfg.k_max, backend)
            vws.append(vertical_total_words(z_c, valid, L))
        ks.append(k_i)
        rws.append((bits_i + 31) // 32)
    k_c = jnp.stack(ks)                                         # [C, B]
    rw_c, vw_c = jnp.stack(rws), jnp.stack(vws)                 # [C, B]
    opts = jnp.stack([rw_c, vw_c], axis=1).reshape(2 * C, B)
    o = jnp.argmin(opts, axis=0).astype(jnp.int32)  # first minimum wins
    choice = o >> 1
    coder = o & 1

    c_axis = jnp.arange(C, dtype=jnp.int32)
    oh = c_axis[:, None] == choice[None, :]
    k = jnp.sum(jnp.where(oh, k_c, 0), axis=0)
    k = jnp.where(coder == 0, k, 0).astype(jnp.int32)
    return choice, coder, k


adaptive_select = jax.jit(
    adaptive_select_body, static_argnames=("cfg", "backend")
)


def emit_blocks_body(
    x: jnp.ndarray,        # [B, L] int32
    n: jnp.ndarray,        # [B] int32
    history: jnp.ndarray,  # [B, 4] int32
    choice: jnp.ndarray,   # [B] i32 forced candidate index
    k: jnp.ndarray,        # [B] i32 forced Rice k (ignored for vertical)
    cfg: CodecConfig,
    coder: str,            # static: "rice" | "vertical" for this group
    backend: str = "auto",
) -> EncodedBlocks:
    """Emit blocks with a host-forced (candidate, k) selection.

    Second phase of adaptive encoding: the host groups blocks by the coder
    chosen in adaptive_select and emits each group with static shapes.
    Delegates to _emit_selected — the same code path encode_blocks uses.
    """
    return _emit_selected(x, n, history, choice, k, cfg, coder, backend)


emit_blocks = jax.jit(
    emit_blocks_body, static_argnames=("cfg", "coder", "backend")
)

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


def encode_blocks_body(
    x: jnp.ndarray,        # [B, L] int32
    n: jnp.ndarray,        # [B] int32 valid lengths
    history: jnp.ndarray,  # [B, 4] int32
    cfg: CodecConfig,
    backend: str = "xla",
) -> EncodedBlocks:
    """Traceable encode pipeline; also the per-shard body under shard_map."""
    B, L = x.shape
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]  # [B, L]

    cands = cfg.candidates()
    r_all = predict.all_candidate_residuals(x, history, cfg)  # [C, B, L]
    z_all = rice.zigzag(r_all)
    C = len(cands)
    c_axis = jnp.arange(C, dtype=jnp.int32)

    # Candidate selection is one-hot sums, never take_along_axis: a [B, L]
    # gather on this TPU costs ~ms while C<=6 masked passes fuse into the
    # producers (same reasoning as vertical_xla._select_width).
    def _pick(arr_c, choice):
        oh = c_axis[:, None] == choice[None, :]  # [C, B]
        oh = oh.reshape(oh.shape + (1,) * (arr_c.ndim - 2))
        return jnp.sum(jnp.where(oh, arr_c, 0), axis=0, dtype=arr_c.dtype)

    if cfg.coder == "vertical":
        from dctpu.kernels.vertical_xla import vertical_selection_cost

        cost_c = vertical_selection_cost(z_all, valid[None])  # [C, B]
        choice = jnp.argmin(cost_c, axis=0).astype(jnp.int32)
        z = _pick(z_all, choice)
        k = jnp.zeros(B, jnp.int32)
    else:
        # Exact per-candidate k selection — bit-plane tables, 2 passes over
        # z_all instead of the 33-reduction sweep (rice.choose_k_planes).
        nb = jnp.broadcast_to(n[None, :], (C, B))
        k_c, bits_c = rice.choose_k_planes(z_all, nb, L, cfg.k_max)  # [C, B]
        # Candidate argmin; ties -> earliest candidate (normative order).
        choice = jnp.argmin(bits_c, axis=0).astype(jnp.int32)  # [B]
        k = _pick(k_c, choice)
        z = _pick(z_all, choice)  # [B, L]

    pred_ids = jnp.array([p for p, _ in cands], dtype=jnp.int32)
    tidx_ids = jnp.array(
        [ti if p == LPC else 0 for p, ti in cands], dtype=jnp.int32
    )
    predictor = _pick(pred_ids[:, None] + jnp.zeros((1, B), jnp.int32), choice)
    table_idx = _pick(tidx_ids[:, None] + jnp.zeros((1, B), jnp.int32), choice)

    if cfg.coder == "vertical":
        from dctpu.kernels.vertical_xla import encode_vertical

        # backend selects the exception-extraction kernel (the only stage
        # with a Pallas fast path); everything else is shared XLA.
        exc = "pallas" if backend.startswith("pallas") else "xla"
        payload, bit_len = encode_vertical(z, n, L, exc_backend=exc)
    else:
        code_lo, code_hi, length = rice.codewords(z, k[:, None])
        payload, bit_len = kernels.pack(
            code_lo, code_hi, length, valid, L, backend
        )
    return EncodedBlocks(predictor, k, table_idx, bit_len, payload)


encode_blocks = jax.jit(
    encode_blocks_body, static_argnames=("cfg", "backend")
)


# --------------------------------------------------- adaptive coder (§4.1)


def adaptive_select_body(
    x: jnp.ndarray,        # [B, L] int32
    n: jnp.ndarray,        # [B] int32
    history: jnp.ndarray,  # [B, 4] int32
    cfg: CodecConfig,
):
    """FORMAT §4.1 joint (candidate, coder) selection by exact word count.

    Returns (choice [B] i32 candidate index, coder [B] i32 0=RICE/1=VERTICAL,
    k [B] i32). Option order c0-RICE, c0-VERT, c1-RICE, ... with first-wins
    argmin implements the normative tie-break.
    """
    from dctpu.kernels.vertical_xla import vertical_total_words

    B, L = x.shape
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    r_all = predict.all_candidate_residuals(x, history, cfg)  # [C, B, L]
    z_all = rice.zigzag(r_all)
    C = z_all.shape[0]

    nb = jnp.broadcast_to(n[None, :], (C, B))
    k_c, bits_c = rice.choose_k_planes(z_all, nb, L, cfg.k_max)  # [C, B]
    rw_c = (bits_c + 31) // 32
    vw_c = vertical_total_words(z_all, valid[None], L)          # [C, B]
    opts = jnp.stack([rw_c, vw_c], axis=1).reshape(2 * C, B)
    o = jnp.argmin(opts, axis=0).astype(jnp.int32)  # first minimum wins
    choice = o >> 1
    coder = o & 1

    c_axis = jnp.arange(C, dtype=jnp.int32)
    oh = c_axis[:, None] == choice[None, :]
    k = jnp.sum(jnp.where(oh, k_c, 0), axis=0)
    k = jnp.where(coder == 0, k, 0).astype(jnp.int32)
    return choice, coder, k


adaptive_select = jax.jit(adaptive_select_body, static_argnames=("cfg",))


def emit_blocks_body(
    x: jnp.ndarray,        # [B, L] int32
    n: jnp.ndarray,        # [B] int32
    history: jnp.ndarray,  # [B, 4] int32
    choice: jnp.ndarray,   # [B] i32 forced candidate index
    k: jnp.ndarray,        # [B] i32 forced Rice k (ignored for vertical)
    cfg: CodecConfig,
    coder: str,            # static: "rice" | "vertical" for this group
    backend: str = "xla",
) -> EncodedBlocks:
    """Emit blocks with a host-forced (candidate, k) selection.

    Second phase of adaptive encoding: the host groups blocks by the coder
    chosen in adaptive_select and emits each group with static shapes.
    """
    B, L = x.shape
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    cands = cfg.candidates()
    r_all = predict.all_candidate_residuals(x, history, cfg)
    z_all = rice.zigzag(r_all)
    C = len(cands)
    c_axis = jnp.arange(C, dtype=jnp.int32)

    def _pick(arr_c, sel):
        oh = c_axis[:, None] == sel[None, :]
        oh = oh.reshape(oh.shape + (1,) * (arr_c.ndim - 2))
        return jnp.sum(jnp.where(oh, arr_c, 0), axis=0, dtype=arr_c.dtype)

    z = _pick(z_all, choice)
    pred_ids = jnp.array([p for p, _ in cands], dtype=jnp.int32)
    tidx_ids = jnp.array(
        [ti if p == LPC else 0 for p, ti in cands], dtype=jnp.int32
    )
    predictor = _pick(pred_ids[:, None] + jnp.zeros((1, B), jnp.int32), choice)
    table_idx = _pick(tidx_ids[:, None] + jnp.zeros((1, B), jnp.int32), choice)

    if coder == "vertical":
        from dctpu.kernels.vertical_xla import encode_vertical

        exc = "pallas" if backend.startswith("pallas") else "xla"
        payload, bit_len = encode_vertical(z, n, L, exc_backend=exc)
        k = jnp.zeros(B, jnp.int32)
    else:
        code_lo, code_hi, length = rice.codewords(z, k[:, None])
        payload, bit_len = kernels.pack(
            code_lo, code_hi, length, valid, L, backend
        )
    return EncodedBlocks(predictor, k, table_idx, bit_len, payload)


emit_blocks = jax.jit(
    emit_blocks_body, static_argnames=("cfg", "coder", "backend")
)

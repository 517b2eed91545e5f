"""Bit-plane selection kernels (v3) vs the round-4 reduction kernel."""

import jax.numpy as jnp
import numpy as np

from dctpu.codec.predict import residuals_for_candidate
from dctpu.codec.rice import zigzag
from dctpu.constants import DELTA, DOUBLE_DELTA
from dctpu.kernels.select_bp import adaptive_totals_bp, adaptive_totals_xbp
from dctpu.kernels.select_pallas import adaptive_totals_pallas


def test_bp_totals_match_reduction_kernel(rng):
    for L in (256, 200, 4096):
        B = 5
        z = (rng.geometric(0.03, size=(B, L)) - 1).astype(np.uint32)
        z[0, :7] = 0xFFFFFFFF  # escape-heavy
        z[1] = 0
        n = np.full(B, L, np.int32)
        n[-1] = max(1, L - 57)
        n[-2] = 0
        zj, nj = jnp.asarray(z), jnp.asarray(n)
        t_ref, v_ref = adaptive_totals_pallas(zj, nj, L, 24, interpret=True)
        t_bp, v_bp = adaptive_totals_bp(zj, nj, L, 24, interpret=True)
        assert np.array_equal(np.asarray(t_ref), np.asarray(t_bp)), L
        assert np.array_equal(np.asarray(v_ref), np.asarray(v_bp)), L


def test_xbp_matches_per_candidate_derivation(rng):
    """In-register DELTA/DOUBLE_DELTA == XLA residual+zigzag -> bp totals."""
    for L in (256, 200, 4096):
        B = 5
        x = rng.integers(-(2**28), 2**28, size=(B, L)).astype(np.int32)
        x[0, :9] = np.int32(-(2**31))  # wrap-heavy residuals
        x[1] = 0
        h = rng.integers(-(2**28), 2**28, size=(B, 4)).astype(np.int32)
        n = np.full(B, L, np.int32)
        n[-1] = max(1, L - 57)
        n[-2] = 0
        n[2] = 128  # cut exactly at a sub-block boundary
        xj, hj, nj = jnp.asarray(x), jnp.asarray(h), jnp.asarray(n)
        t_x, v_x = adaptive_totals_xbp(xj, hj, nj, L, 24, interpret=True)
        for ci, pred in enumerate((DELTA, DOUBLE_DELTA)):
            z = zigzag(residuals_for_candidate(xj, hj, pred, None))
            t_ref, v_ref = adaptive_totals_bp(z, nj, L, 24, interpret=True)
            assert np.array_equal(np.asarray(t_ref), np.asarray(t_x[ci])), (
                L, pred,
            )
            assert np.array_equal(np.asarray(v_ref), np.asarray(v_x[ci])), (
                L, pred,
            )

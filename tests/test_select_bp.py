"""Bit-plane selection kernel vs the round-4 reduction kernel, bit-exact."""

import jax.numpy as jnp
import numpy as np

from dctpu.kernels.select_bp import adaptive_totals_bp
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

"""Codec configuration.

One small frozen dataclass (SURVEY.md §5 "Config/flag system"): everything that
affects the bitstream is serialized into the frame (block_len, LPC tables), so a
decoder never needs the config object.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from dctpu.constants import (
    BLOCK_LEN_DEFAULT,
    DELTA,
    DOUBLE_DELTA,
    K_MAX,
    LPC,
    LPC_MAX_ORDER,
)


@dataclasses.dataclass(frozen=True)
class LpcTable:
    """One shared fixed-point (Q16) linear-predictor coefficient set."""

    order: int                      # 1..4
    coeffs: Tuple[int, int, int, int]  # int32 Q16; entries past `order` are 0

    def __post_init__(self):
        if not (1 <= self.order <= LPC_MAX_ORDER):
            raise ValueError(f"LPC order must be 1..{LPC_MAX_ORDER}, got {self.order}")
        if len(self.coeffs) != LPC_MAX_ORDER:
            raise ValueError("coeffs must have exactly 4 entries (zero-padded)")


_Q = 1 << 16

# Built-in coefficient sets: polynomial extrapolators of increasing order plus a
# smoothing predictor. Corpus-fit tables can replace these (dctpu.codec.select).
DEFAULT_LPC_TABLES: Tuple[LpcTable, ...] = (
    LpcTable(order=3, coeffs=(3 * _Q, -3 * _Q, 1 * _Q, 0)),        # quadratic extrapolation
    LpcTable(order=2, coeffs=(3 * _Q // 2, -_Q // 2, 0, 0)),       # damped linear (1.5, -0.5)
    LpcTable(order=2, coeffs=(_Q // 2, _Q // 2, 0, 0)),            # two-sample average
    LpcTable(order=4, coeffs=(4 * _Q, -6 * _Q, 4 * _Q, -1 * _Q)),  # cubic extrapolation
)


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Encoder-side knobs. Frame-affecting values are stored in the frame."""

    block_len: int = BLOCK_LEN_DEFAULT
    predictors: Tuple[int, ...] = (DELTA, DOUBLE_DELTA, LPC)
    lpc_tables: Tuple[LpcTable, ...] = DEFAULT_LPC_TABLES
    k_max: int = K_MAX
    # "rice" = max ratio (reference-parity pipeline); "vertical" = bit-plane
    # coder, dense vector ops end to end (docs/FORMAT.md §2.2).
    coder: str = "rice"

    def candidates(self) -> Tuple[Tuple[int, int], ...]:
        """Ordered (predictor, table_idx) candidate list.

        Order is normative for tie-breaking (docs/FORMAT.md §4): DELTA,
        DOUBLE_DELTA, then LPC tables in table order.
        """
        cands = []
        if DELTA in self.predictors:
            cands.append((DELTA, 0))
        if DOUBLE_DELTA in self.predictors:
            cands.append((DOUBLE_DELTA, 0))
        if LPC in self.predictors:
            for ti in range(len(self.lpc_tables)):
                cands.append((LPC, ti))
        if not cands:
            raise ValueError("config enables no predictors")
        return tuple(cands)

"""Bit pack/unpack kernels: the codec's hot layer (SURVEY.md §2.1).

Two interchangeable backends behind one interface:
  - pack_xla / unpack_xla: pure-XLA v0 — the permanent, CPU-testable fallback
    that also serves as the executable kernel spec.
  - pack_pallas / unpack_pallas: Pallas TPU kernels (VMEM-resident, one grid
    program per block tile).

Dispatch lives in dctpu.kernels.api.
"""

from dctpu.kernels.api import pack, unpack  # noqa: F401
from dctpu.kernels.pack_xla import pack_xla, padded_words  # noqa: F401
from dctpu.kernels.unpack_xla import unpack_xla  # noqa: F401

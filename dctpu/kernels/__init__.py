"""Bit pack/unpack kernels: the codec's hot layer (SURVEY.md §2.1).

Interchangeable backends behind one interface (dispatch in
dctpu.kernels.api):
  - pack_scan / unpack_scan: the production XLA kernels ("auto" picks —
    they won every on-chip head-to-head).
  - pack_xla / unpack_xla: pure-XLA v0 — the permanent, CPU-testable
    fallback that also serves as the executable kernel spec.
  - attic/pack_pallas, attic/unpack_pallas: retired Pallas twins, kept for
    regression tests only (see attic/__init__.py for the numbers).
"""

from dctpu.kernels.api import pack, unpack  # noqa: F401
from dctpu.kernels.pack_xla import pack_xla, padded_words  # noqa: F401
from dctpu.kernels.unpack_xla import unpack_xla  # noqa: F401

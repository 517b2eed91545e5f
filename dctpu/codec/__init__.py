"""Codec layer: scalar reference implementation and jitted XLA block codec."""

from dctpu.codec.api import compress, decompress  # noqa: F401
from dctpu.codec.scalar import (  # noqa: F401
    scalar_compress,
    scalar_decompress,
    scalar_decode_block,
    scalar_encode_block,
)

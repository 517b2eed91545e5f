"""Section integrity checksums: CRC-32 (IEEE 802.3), zlib-compatible.

The C++ oracle implements the identical table-driven CRC (oracle/crc32.h).
"""

import zlib


def crc32(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF

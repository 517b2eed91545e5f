"""Frame parser robustness: fuzzed inputs raise, never crash."""

import numpy as np



def test_read_frame_fuzz_never_crashes(rng):
    """Truncations, bit flips, and garbage must raise ValueError (or decode
    to the original when the flip misses every parsed section) — never
    IndexError/SEGV/etc. CRC sections cover the whole payload, so any
    surviving parse of corrupted bytes is a bug."""
    from dctpu.codec import scalar
    from dctpu.config import CodecConfig
    from dctpu.format.frame import read_frame, write_frame

    streams = [rng.integers(-500, 500, size=700, dtype=np.int64).astype(np.int32)]
    data = bytearray(write_frame(
        scalar.scalar_compress(streams, CodecConfig(block_len=256))
    ))

    for cut in (0, 1, 3, 7, len(data) // 2, len(data) - 1):
        try:
            read_frame(bytes(data[:cut]))
        except ValueError:
            pass

    for _ in range(60):
        bad = bytearray(data)
        pos = int(rng.integers(0, len(bad)))
        bad[pos] ^= int(rng.integers(1, 256))
        try:
            read_frame(bytes(bad))
        except ValueError:
            pass

    for _ in range(20):
        blob = bytes(rng.integers(0, 256, size=int(rng.integers(0, 300)),
                                  dtype=np.int64).astype(np.uint8))
        try:
            read_frame(b"DCF1" + blob)
        except ValueError:
            pass

"""Host-CPU baselines: entropy bound + zlib/lzma on the pinned corpus.

The original C reference is unavailable (SURVEY.md §0), so these give the
interim comparison points for BASELINE.md: the corpus' order-0 entropy of
delta residuals (a lower-bound proxy), and general-purpose compressors.

Run: python bench/baselines.py
"""

import json
import lzma
import sys
import time
import zlib

import numpy as np


def entropy_bits_per_sample(z: np.ndarray) -> float:
    _, counts = np.unique(z, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log2(p)).sum())


def main():
    sys.path.insert(0, ".")
    from dctpu.codec import scalar
    from dctpu.corpus import synth_corpus

    streams, _, _ = synth_corpus(16, 1 << 17, seed=123, mixed_cadence=True,
                                 cumulative_frac=0.25)
    raw = b"".join(np.asarray(s, dtype="<i4").tobytes() for s in streams)
    results = {"raw_bytes": len(raw)}

    # order-0 entropy of delta-zigzag residuals (capability-relevant bound)
    zs = []
    for s in streams:
        r = scalar.residuals(s, np.zeros(4, np.int32), 0, None)
        zs.append(scalar.zigzag(r))
    z = np.concatenate(zs)
    results["delta_entropy_bits_per_sample"] = round(entropy_bits_per_sample(z), 3)
    results["delta_entropy_ratio"] = round(
        32 / results["delta_entropy_bits_per_sample"], 3
    )

    for name, f in [
        ("zlib6", lambda d: zlib.compress(d, 6)),
        ("zlib9", lambda d: zlib.compress(d, 9)),
        ("lzma6", lambda d: lzma.compress(d, preset=6)),
    ]:
        t0 = time.time()
        c = f(raw)
        dt = time.time() - t0
        results[name] = {
            "ratio": round(len(raw) / len(c), 3),
            "mbps": round(len(raw) / dt / 1e6, 1),
        }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

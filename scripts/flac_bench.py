"""FLAC decoder throughput measurement (VERDICT r03 #6 evidence).

Encodes a 400k-sample int16 random-walk signal (realistic audio shape:
smooth, so fixed predictors + rice coding engage) with each encoder
mode, decodes best-of-3, and prints MB/s for the compressed stream and
the decoded PCM. Run: ``python scripts/flac_bench.py``.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_feature_extraction_spark.multimodal import flac as fl  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(3)
    n = 400_000
    sig = np.clip(
        np.cumsum(rng.integers(-80, 81, size=n)), -32768, 32767
    ).astype(np.int16)
    cases = [
        ("fixed2+rice", dict(subframe="fixed2", rice_param=6)),
        ("fixed2+rice po=2",
         dict(subframe="fixed2", rice_param=6, partition_order=2)),
        ("verbatim", dict(subframe="verbatim")),
        ("lpc1+rice", dict(subframe="lpc1", rice_param=6)),
    ]
    for name, kw in cases:
        payload = fl.encode_flac(sig, 16000, **kw)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, _ = fl.decode_flac(payload)
            best = min(best, time.perf_counter() - t0)
        exact = np.array_equal(
            np.round(out * 32768).astype(np.int64), sig.astype(np.int64)
        )
        print(
            f"{name}: {len(payload) / 1e6 / best:.1f} MB/s compressed, "
            f"{n * 2 / 1e6 / best:.1f} MB/s PCM, exact={exact}"
        )


if __name__ == "__main__":
    main()

"""Span-dedup pass-2 shape crossover demo (VERDICT r04 #6).

Builds a synthetic corpus at a controlled duplicate rate and times
``duplicate_gram_spans`` in its two physical shapes plus the adaptive
default:

* ``direct`` — explode full k-token grams once, filter on the hot-hash
  set (wins when most positions are duplicated, e.g. the x20-amplified
  bench input);
* ``gather`` — hash-only position stream, semi-join against hot hashes,
  re-slice grams from ``tokens`` at ONLY the surviving positions (wins
  when duplicates are rare — the realistic corpus regime);
* ``adaptive`` — probes the hot-position fraction from the checkpointed
  hash counts and picks (<35% hot -> gather).

    python scripts/span_shape_demo.py [n_docs] [dup_pct]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from audio_feature_extraction_spark.core.session import get_spark  # noqa: E402
from audio_feature_extraction_spark.operators import dedup  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    dup_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    spark = get_spark("local[16]")

    # Deterministic synthetic corpus: each doc is 200 hash-derived
    # tokens. A dup_pct fraction of docs share one template (every
    # gram in those docs is duplicated); the rest are unique.
    dup_n = int(n * dup_pct / 100)
    docs = spark.range(0, n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.expr(
            f"CASE WHEN id < {dup_n} THEN "
            "transform(sequence(1, 200), i -> cast(xxhash64(i) % 50000 as int)) "
            "ELSE transform(sequence(1, 200), "
            "i -> cast(xxhash64(id * 1000 + i) % 50000 as int)) END"
        ).alias("tokens"),
    ).withColumn("n_tok", F.size("tokens")).repartition(32)
    docs.write.mode("overwrite").parquet("/tmp/span_demo_docs")
    base = spark.read.parquet("/tmp/span_demo_docs")
    base.count()

    print(f"n_docs={n} dup_pct={dup_pct}")
    for name, kw in [
        ("direct", {"gather": False}),
        ("gather", {"gather": True}),
        ("adaptive", {}),
    ]:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            dedup.duplicate_gram_spans(base, **kw).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>9}: {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

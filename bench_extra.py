"""Per-query noop-sink isolation bench (guide §1.4) — NOT the driver
contract; bench.py stays the frozen measurement. Usage:

    python bench_extra.py dup_spans asof_join_range [--reps 3]

Builds the same amplified inputs as bench.py (reuses the /tmp parquet
cache), warms the page cache the same way, and times each named query
best-of-N with the noop sink, printing one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "20"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = 2
    argv = sys.argv[1:]
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = argv
    from pyspark.sql import functions as F

    from audio_feature_extraction_spark.core.session import get_spark
    from audio_feature_extraction_spark.core.config import FrameSpec
    from audio_feature_extraction_spark.operators import (
        asof, bpe, dedup, framing, inverse, mixing, retrieval,
        sessionize, similarity, temporal, textstats,
    )

    spark = get_spark(f"local[{CPUS}]", app_name="bench_extra")
    spec = FrameSpec(frame_len=16, hop=8)
    sf_tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    amplified = spark.read.parquet(f"/tmp/bench_tokens_{sf_tag}_x{AMPLIFY}")
    ev_amp_n = int(os.environ.get("SPARK_GRAFT_EV_AMPLIFY", "50"))
    ev = spark.read.parquet(f"/tmp/bench_events_{sf_tag}_x{ev_amp_n}")
    probes = ev.where(F.col("event_type") == "view")
    states = ev.where(F.col("event_type").isin("click", "purchase"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    queries = {
        "frame_features": lambda: framing.frame_features(amplified, spec),
        "frame_features_f32": lambda: framing.frame_features_compact(
            amplified, spec
        ),
        "roundtrip": lambda: inverse.roundtrip_check(
            amplified, framing.frame_table(amplified, spec), spec
        ),
        "asof_join": lambda: asof.asof_join(probes, states),
        "asof_join_auto": lambda: asof.asof_join_auto(probes, states),
        "asof_join_range": lambda: asof.asof_join_range(
            probes, states, num_partitions=CPUS
        ),
        "sessionize": lambda: sessionize.session_summary(ev, 1800.0),
        "backfill": lambda: temporal.backfill(
            ev.withColumn(
                "value",
                F.when(
                    F.col("event_type") == "view", None
                ).otherwise(F.col("value")),
            )
        ),
        "minhash_lsh_pairs": lambda: dedup.lsh_candidate_pairs(amplified),
        "dup_spans": lambda: dedup.duplicate_gram_spans(amplified),
        "ann_lsh": lambda: similarity.lsh_topk(
            emb, emb.where(F.expr("vec_id % 20 = 0")), k=5
        ),
        "semdedup": lambda: similarity.semdedup_pairs(
            emb, threshold=0.2, n_clusters=64
        ),
        "nb_quality": lambda: textstats.nb_quality(amplified),
        "dsir_sample": lambda: mixing.dsir_sample(amplified, 1000),
        "bm25": lambda: retrieval.retrieval_topk(docs, k=5),
    }
    # warm (same as bench.py)
    _noop(
        amplified.select("doc_id", "tokens").mapInPandas(
            lambda it: it, "doc_id string, tokens array<int>"
        )
    )
    _noop(ev)
    timings = {}
    for name in args or list(queries):
        thunk = queries[name]
        best = float("inf")
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            _noop(thunk())
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        timings[name] = {"best": round(best, 3), "samples": samples}
    print(json.dumps({"queries": timings, "load": os.getloadavg()[0]}))
    spark.stop()


if __name__ == "__main__":
    main()

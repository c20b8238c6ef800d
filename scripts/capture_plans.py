"""Capture .explain('formatted') for every bench query into plans/r06/.

Usage: python scripts/capture_plans.py before|after [query ...]

Builds the exact same inputs bench.py uses (amplified tokens + events at
$SPARK_GRAFT_SF_DIR) and writes plans/r06/<query>_<tag>.txt per query.
Plan capture only (no noop execution) — but note asof_join_range and
dup_spans run their driver-side passes (pass A / probe) while the plan
is being BUILT; their files show the final served plan and the
multi-pass structure is documented in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "20"))
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    from pyspark.sql import functions as F

    from audio_feature_extraction_spark.core.session import get_spark
    from audio_feature_extraction_spark.core.config import FrameSpec
    from audio_feature_extraction_spark.operators import (
        asof, bpe, dedup, framing, inverse, mixing, retrieval,
        sessionize, similarity, temporal, textstats,
    )

    spark = get_spark(f"local[{CPUS}]", app_name="capture_plans")
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
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, thunk in queries.items():
        if only and name not in only:
            continue
        df = thunk()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness — one JSON line on stdout (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``. Execution is
forced with the noop sink (no collect overhead). The flagship
frame-feature workload amplifies the 5k-document token table by a
deterministic replication factor so the kernel processes ~100k sequences
— throughput is reported as sequences/sec.

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N executors;
sandbox has no cluster): ``python bench.py --scaling`` runs the same
workload in fresh subprocesses at local[8] and local[32] and reports
throughput at both plus the efficiency ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "20"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_queries(parallelism: int, amplify: int = AMPLIFY) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from audio_feature_extraction_spark.core.session import get_spark
    from audio_feature_extraction_spark.core.config import FrameSpec
    from audio_feature_extraction_spark.operators import (
        asof, framing, inverse, sessionize, temporal,
    )
    from audio_feature_extraction_spark.sources.tokens import load_token_sequences

    spark = get_spark(f"local[{parallelism}]", app_name=f"bench[{parallelism}]")
    spec = FrameSpec(frame_len=16, hop=8)

    base = load_token_sequences(spark, SF_DIR)
    # deterministic amplification: R replicas with distinct doc_ids
    amplified = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
        .withColumn("doc_id", F.concat_ws("_r", "doc_id", "rep"))
        .drop("rep")
        .repartition(parallelism * 4)
        .persist()
    )
    n_seq = amplified.count()  # materialize before timing

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.count()  # warm file metadata

    # warmup: spawn every Python UDF worker + JIT the kernel before timing
    _noop(framing.frame_features(base.repartition(parallelism), spec))

    timings: dict[str, float] = {}

    def timed(name, thunk):
        t0 = time.perf_counter()
        thunk()
        timings[name] = round(time.perf_counter() - t0, 3)

    timed("frame_features", lambda: _noop(framing.frame_features(amplified, spec)))
    timed(
        "roundtrip",
        lambda: _noop(
            inverse.roundtrip_check(amplified, framing.frame_table(amplified, spec), spec)
        ),
    )
    timed(
        "asof_join",
        lambda: _noop(
            asof.asof_join(
                ev.where(F.col("event_type") == "view"),
                ev.where(F.col("event_type").isin("click", "purchase")),
            )
        ),
    )
    timed("sessionize", lambda: _noop(sessionize.session_summary(ev, 1800.0)))
    timed(
        "backfill",
        lambda: _noop(
            temporal.backfill(
                ev.withColumn(
                    "value",
                    F.when(F.col("event_type") == "view", None).otherwise(F.col("value")),
                )
            )
        ),
    )
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "e2e_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "parallelism": parallelism,
        "n_sequences": n_seq,
        "seq_per_sec": round(n_seq / timings["frame_features"], 1),
    }
    spark.stop()
    return result


def main() -> None:
    if "--scaling" in sys.argv:
        # same job + input at N and 4N parallelism, fresh JVMs, larger
        # amplification so per-level wall time amortizes fixed costs
        amp = int(os.environ.get("SPARK_GRAFT_SCALING_AMPLIFY", "100"))
        results = {}
        for p in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", str(p),
                 "--amplify", str(amp)],
                capture_output=True, text=True, check=True,
            )
            results[p] = json.loads(out.stdout.strip().splitlines()[-1])
        t8, t32 = results[8]["seq_per_sec"], results[32]["seq_per_sec"]
        eff = round(t32 / (t8 * 4), 3)
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32",
            "value": eff,
            "unit": "ratio",
            "throughput": {"local[8]": t8, "local[32]": t32},
            "queries": {
                "local[8]": results[8]["queries"],
                "local[32]": results[32]["queries"],
            },
            "sf": results[32]["sf"],
            "n_sequences": results[32]["n_sequences"],
        }))
        return
    if "--single" in sys.argv:
        p = int(sys.argv[sys.argv.index("--single") + 1])
        amp = (
            int(sys.argv[sys.argv.index("--amplify") + 1])
            if "--amplify" in sys.argv
            else AMPLIFY
        )
        print(json.dumps(run_queries(p, amp)))
        return
    print(json.dumps(run_queries(CPUS)))


if __name__ == "__main__":
    main()

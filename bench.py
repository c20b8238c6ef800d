"""Benchmark harness — one JSON line on stdout (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``. Execution is
forced with the noop sink (no collect overhead). The flagship
frame-feature workload amplifies the 5k-document token table by a
deterministic replication factor so the kernel processes ~100k sequences
— throughput is reported as sequences/sec.

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N executors;
sandbox has no cluster): ``python bench.py --scaling`` runs the same
workload in fresh subprocesses at local[4] and local[16] (N and 4N;
see main() for why not 8/32 on a 32-core box) and reports throughput
at both plus the efficiency ratio, best-of-3 per query.
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


def run_queries(
    parallelism: int,
    amplify: int = AMPLIFY,
    core_only: bool = False,
    flagship_only: bool = False,
) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from audio_feature_extraction_spark.core.session import get_spark
    from audio_feature_extraction_spark.core.config import FrameSpec
    from audio_feature_extraction_spark.operators import (
        asof, bpe, dedup, framing, inverse, mixing, retrieval,
        sessionize, similarity, temporal, textstats,
    )
    from audio_feature_extraction_spark.sources.tokens import load_token_sequences

    _LOAD0 = round(os.getloadavg()[0], 2)
    spark = get_spark(f"local[{parallelism}]", app_name=f"bench[{parallelism}]")
    spec = FrameSpec(frame_len=16, hop=8)

    # deterministic amplification: R replicas with distinct doc_ids,
    # materialized once as parquet — the realistic columnar input (an
    # Iceberg/parquet scan), not a JVM row cache
    sf_tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    amp_path = f"/tmp/bench_tokens_{sf_tag}_x{amplify}"
    if not os.path.exists(os.path.join(amp_path, "_SUCCESS")):
        base = load_token_sequences(spark, SF_DIR)
        (
            base.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1)))
            )
            .withColumn("doc_id", F.concat_ws("_r", "doc_id", "rep"))
            .drop("rep")
            .repartition(128)
            .write.mode("overwrite")
            .parquet(amp_path)
        )
    amplified = spark.read.parquet(amp_path)
    n_seq = amplified.count()

    # amplified events: EV_AMP replicas, distinct users/event_ids, with a
    # deliberate hot entity (user_id 0 keeps ~1/16 of all rows) for the
    # skew benchmarks
    ev_amp_n = int(os.environ.get("SPARK_GRAFT_EV_AMPLIFY", "50"))
    ev_path = f"/tmp/bench_events_{sf_tag}_x{ev_amp_n}"
    if not os.path.exists(os.path.join(ev_path, "_SUCCESS")):
        ev0 = spark.read.parquet(f"{SF_DIR}/events.parquet")
        (
            ev0.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(ev_amp_n - 1)))
            )
            .select(
                (F.col("event_id") * ev_amp_n + F.col("rep")).alias("event_id"),
                F.expr("timestampadd(SECOND, rep, ts)").alias("ts"),
                F.when(F.col("rep") % 16 == 0, F.lit(0))
                .otherwise(F.col("user_id") + F.col("rep") * 100)
                .alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(ev_path)
        )
    if flagship_only:
        # scaling mode: time ONLY the flagship feature-extraction job —
        # the events-table queries don't feed seq_per_sec, and skipping
        # them lets the scaling run afford a much larger token input so
        # per-run fixed costs (JVM/job setup, scan open, first-batch JIT)
        # don't masquerade as poor scaling
        _noop(
            amplified.select("doc_id", "tokens").mapInPandas(
                lambda it: it, "doc_id string, tokens array<int>"
            )
        )
        _noop(framing.frame_features(amplified.limit(20000), spec))
        timings: dict[str, float] = {}

        def timed_f(name, thunk, reps=None):
            if reps is None:
                reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                thunk()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)

        timed_f("frame_features", lambda: _noop(framing.frame_features(amplified, spec)))
        timed_f(
            "frame_features_f32",
            lambda: _noop(framing.frame_features_compact(amplified, spec)),
        )
        # a SHUFFLE-BOUND job at the same two levels: the narrow
        # flagship mostly proves task scheduling scales; the as-of join
        # (union + repartition + window carry) is the exchange-heavy
        # shape whose scaling a cluster operator actually worries about.
        # Uses the amplified 5M-event table (built once, /tmp-cached
        # across the scaling subprocesses).
        ev_bench = spark.read.parquet(ev_path)
        probes_b = ev_bench.where(F.col("event_type") == "view")
        states_b = ev_bench.where(
            F.col("event_type").isin("click", "purchase")
        )
        _noop(ev_bench)
        timed_f(
            "asof_join",
            lambda: _noop(asof.asof_join(probes_b, states_b)),
        )
        n_ev = ev_bench.count()
        result = {
            "metric": "e2e_wall_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
            "parallelism": parallelism,
            "n_sequences": n_seq,
            "seq_per_sec": round(n_seq / timings["frame_features"], 1),
            "events_per_sec": round(n_ev / timings["asof_join"], 1),
        }
        spark.stop()
        return result
    ev = spark.read.parquet(ev_path)
    n_events = ev.count()

    # warmup: spawn every Python UDF worker, JIT the kernel, warm the
    # page cache with one full identity pass
    _noop(
        amplified.select("doc_id", "tokens").mapInPandas(
            lambda it: it, "doc_id string, tokens array<int>"
        )
    )
    _noop(framing.frame_features(amplified.limit(20000), spec))
    # warm the events file too — count() reads no data columns, so
    # without this the first events query pays cold-cache disk I/O and
    # best-of-2 can't save it (r02 recorded asof_join 4.0s that way;
    # warm it measures 1.9s)
    _noop(ev)

    timings: dict[str, float] = {}

    def timed(name, thunk, reps: int | None = None):
        if reps is None:
            reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            thunk()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    timed("frame_features", lambda: _noop(framing.frame_features(amplified, spec)))
    timed(
        "frame_features_f32",
        lambda: _noop(framing.frame_features_compact(amplified, spec)),
    )
    timed(
        "roundtrip",
        lambda: _noop(
            inverse.roundtrip_check(amplified, framing.frame_table(amplified, spec), spec)
        ),
    )
    probes = ev.where(F.col("event_type") == "view")
    states = ev.where(F.col("event_type").isin("click", "purchase"))
    timed("asof_join", lambda: _noop(asof.asof_join(probes, states)))
    # the user-facing default path: the straggler heuristic picks plain vs
    # segmented-scan from the measured key histogram (VERDICT r01 #4 — the
    # hard-coded bucketed variant was the wrong shape for this input; the
    # skew regime where bucketed wins is exercised by scripts/skew_demo.py)
    timed("asof_join_auto", lambda: _noop(asof.asof_join_auto(probes, states)))
    # the range-partitioned two-pass scan (north-star literal shape):
    # numpy segmented carry per sorted partition + driver boundary merge
    timed(
        "asof_join_range",
        lambda: _noop(
            asof.asof_join_range(probes, states, num_partitions=parallelism)
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
    if not core_only:
        # best-of-2 like the core queries: these were reps=1 and a single
        # ambient-load outlier (21s vs the usual ~4s) got recorded
        timed(
            "minhash_lsh_pairs",
            lambda: _noop(dedup.lsh_candidate_pairs(amplified)),
        )
        # substring dedup: the gram explode is the widest shuffle in the
        # suite (~n_tok rows/doc through the hash prefilter)
        timed(
            "dup_spans",
            lambda: _noop(dedup.duplicate_gram_spans(amplified)),
        )
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        timed(
            "ann_lsh",
            lambda: _noop(
                similarity.lsh_topk(emb, emb.where(F.expr("vec_id % 20 = 0")), k=5)
            ),
        )
        # round-5 ops: cluster-restricted semantic dedup and the
        # learned NB quality filter (train + score in one plan)
        timed(
            "semdedup",
            lambda: _noop(
                similarity.semdedup_pairs(emb, threshold=0.2, n_clusters=64)
            ),
        )
        timed(
            "nb_quality",
            lambda: _noop(textstats.nb_quality(amplified)),
        )
        # DSIR content-based selection: fit-on-split + weight-everything
        # + Gumbel-top-k (TakeOrdered) in one lazy plan
        timed(
            "dsir_sample",
            lambda: _noop(mixing.dsir_sample(amplified, 1000)),
        )
        # keyword retrieval: postings + broadcast-pruned BM25 top-k
        # over the full documents corpus (reproducible-log scoring)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        timed(
            "bm25",
            lambda: _noop(retrieval.retrieval_topk(docs, k=5)),
        )
        # BPE: histogram-train once (driver loop over the bounded
        # (word, count) table), then the shuffle-free distributed
        # encode is what's timed — the 100 TB recurring cost
        bpe_model = bpe.train_bpe(docs, n_merges=100)
        timed(
            "bpe_encode",
            lambda: _noop(bpe.bpe_encode(docs, bpe_model)),
        )
    total = round(sum(timings.values()), 3)
    # frozen cross-round comparison set (VERDICT r04 #7): the nine
    # queries benched since r03. e2e_wall_sec grows as workloads are
    # added; this subtotal stays like-for-like across rounds. Do NOT
    # change this list — add new queries to the e2e sum only.
    stable9 = (
        "frame_features", "frame_features_f32", "roundtrip",
        "asof_join", "asof_join_auto", "sessionize", "backfill",
        "minhash_lsh_pairs", "ann_lsh",
    )
    result = {
        "metric": "e2e_wall_sec",
        "value": total,
        "unit": "sec",
        "e2e_stable9_sec": round(
            sum(timings[q] for q in stable9 if q in timings), 3
        ),
        "queries": timings,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "parallelism": parallelism,
        "load_avg_start": _LOAD0,
        "load_avg_end": round(os.getloadavg()[0], 2),
        "n_sequences": n_seq,
        "n_events": n_events,
        "seq_per_sec": round(n_seq / timings["frame_features"], 1),
    }
    if not core_only:
        # outside the e2e sum: latency evidence, not a throughput query
        result["streaming_latency_ms"] = run_streaming_latency(spark)
        # the integration flagship, both execution modes (VERDICT r03
        # #3). Outside the e2e sum (it COMPOSES queries already summed
        # there); its own block keeps the e2e line comparable across
        # rounds while making the lazy-plan production mode's advantage
        # a measured number instead of a claim.
        result["prepare_corpus"] = run_prepare_corpus(spark)
    spark.stop()
    return result


def run_prepare_corpus(spark) -> dict:
    """Wall time for the 6-stage corpus pipeline at SF_DIR in its three
    execution modes, best-of-2 each:

    * ``lazy`` — accounting off, one logical plan; the two outputs
      (corpus + blocks) each materialize the shared 5-stage prefix, so
      the prefix runs twice but nothing is cached (lowest memory).
    * ``accounting`` — persist+count every stage (the dev/report mode);
      fastest wall-clock at bench scale because the persists deduplicate
      the prefix, but the persists are RAM the 100 TB run doesn't have.
    * ``snapshot`` — stage-level durable materialization (resume_dir):
      every stage computed exactly once, downstream stages read
      committed parquet; the scale mode — executor-loss-safe, zero
      cache pressure, and what `prepare-corpus --resume-dir` runs.
    """
    import shutil
    import tempfile

    from audio_feature_extraction_spark.plans import corpus as corpus_plan

    _noop(spark.read.parquet(f"{SF_DIR}/documents.parquet"))  # warm cache
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    def run_mode(mode: str) -> float:
        best = float("inf")
        for _ in range(reps):
            tmp = tempfile.mkdtemp(prefix=f"bench_corpus_{mode}_")
            try:
                cfg = corpus_plan.CorpusConfig(
                    accounting=(mode == "accounting"),
                    resume_dir=(
                        os.path.join(tmp, "stages") if mode == "snapshot" else None
                    ),
                )
                t0 = time.perf_counter()
                mixed, blocks, _ = corpus_plan.prepare_corpus(spark, SF_DIR, cfg)
                _noop(mixed)
                _noop(blocks)
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()  # release accounting persists
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        return round(best, 3)

    return {f"{m}_sec": run_mode(m) for m in ("lazy", "accounting", "snapshot")}


def run_streaming_latency(
    spark, n_docs: int = 2000, chunk_size: int = 64, n_batches: int = 20
) -> dict:
    """Per-micro-batch latency for the stateful streaming extractor
    (VERDICT r02 #5 — the reference's 100 ms chunk budget analog,
    design.md:2064-2081).

    ``n_docs`` docs split into ``chunk_size``-token chunks stream in as
    ``n_batches`` file-triggers (each doc's chunks stay in one trigger);
    the MicroBatchLatencyListener records real triggerExecution times.
    Reported per-batch AND amortized per-chunk: a micro-batch carries
    ~n_docs/n_batches docs' worth of chunks, so the honest comparison
    against a per-chunk budget is batch_ms / chunks_per_batch.
    """
    import shutil
    import tempfile

    from audio_feature_extraction_spark.core.config import FrameSpec
    from audio_feature_extraction_spark.sources.tokens import load_token_sequences
    from audio_feature_extraction_spark.streaming import stream as st

    spec = FrameSpec(frame_len=16, hop=8)
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(tmp, "in")
        ts = load_token_sequences(spark, SF_DIR).limit(n_docs)
        chunks = st.chunk_table(ts, chunk_size)
        n_chunks = chunks.count()
        chunks.repartition(n_batches, "doc_id").write.parquet(src)
        stream_df = (
            spark.readStream.schema(st.CHUNK_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q, listener = st.stream_feature_extract(
            stream_df,
            os.path.join(tmp, "out"),
            os.path.join(tmp, "ck"),
            spec,
            latency_budget_ms=100.0,
        )
        try:
            q.processAllAvailable()
            for _ in range(40):  # listener events arrive asynchronously
                stats = [s for s in listener.stats.values() if s.total >= n_batches]
                if stats:
                    break
                time.sleep(0.25)
        finally:
            q.stop()
            spark.streams.removeListener(listener)
        if not listener.stats:
            # listener dispatch never delivered within the poll window
            # (slow box) — report a timeout marker instead of crashing
            # the whole bench run (ADVICE r03)
            return {
                "batches": 0,
                "chunks": n_chunks,
                "timeout": True,
                "chunk_budget_ms": 100.0,
            }
        stats = max(listener.stats.values(), key=lambda s: s.total)
        samples = sorted(stats.samples)
        p50 = samples[len(samples) // 2] if samples else 0.0
        per_batch_chunks = max(n_chunks / max(stats.total, 1), 1.0)
        return {
            "batches": stats.total,
            "chunks": n_chunks,
            "trigger_p50_ms": round(p50, 1),
            "trigger_max_ms": round(stats.max_ms, 1),
            "per_chunk_ms": round(p50 / per_batch_chunks, 3),
            "chunk_budget_ms": 100.0,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    if "--scaling" in sys.argv:
        # same job + input at N and 4N parallelism, fresh JVMs, larger
        # amplification so per-level wall time amortizes fixed costs.
        # Default pair 4/16 (not 8/32): the box has exactly 32 cores, and
        # local[32] oversubscribes (32 task threads + 32 Python workers +
        # GC on 32 cores), measuring contention instead of scaling — a
        # real N->4N executor scale-up adds machines, not oversubscription.
        #
        # PAIRED design (VERDICT r01 #9): the lo/hi runs are interleaved
        # back-to-back per pair and the reported efficiency is the MEDIAN
        # over pairs — ambient box load hits both halves of a pair alike,
        # so a noisy neighbor shifts a pair's ratio far less than it
        # shifts independent lo/hi medians.
        amp = int(os.environ.get("SPARK_GRAFT_SCALING_AMPLIFY", "400"))
        n_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "3"))
        lo, hi = (
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "4,16").split(",")
        )
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_BENCH_REPS", "3")
        # the shuffle-bound job needs the same fixed-cost amortization
        # the flagship gets from --amplify: at the default 5M events the
        # as-of join finishes in 2-4 s and JVM/scan/exchange setup
        # masquerades as poor scaling. 4x the events => the measured
        # ratio reflects the exchange, not the setup.
        env.setdefault("SPARK_GRAFT_EV_AMPLIFY", "200")

        def run_level(p):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", str(p),
                 "--amplify", str(amp), "--flagship"],
                capture_output=True, text=True, check=True, env=env,
            )
            return json.loads(out.stdout.strip().splitlines()[-1])

        pairs, shuffle_pairs, last = [], [], {}
        for _ in range(n_pairs):
            r_lo, r_hi = run_level(lo), run_level(hi)
            pairs.append(
                {
                    "eff": round(
                        r_hi["seq_per_sec"] / (r_lo["seq_per_sec"] * (hi / lo)), 3
                    ),
                    f"local[{lo}]": r_lo["seq_per_sec"],
                    f"local[{hi}]": r_hi["seq_per_sec"],
                }
            )
            if "events_per_sec" in r_lo:
                shuffle_pairs.append(
                    {
                        "eff": round(
                            r_hi["events_per_sec"]
                            / (r_lo["events_per_sec"] * (hi / lo)),
                            3,
                        ),
                        f"local[{lo}]": r_lo["events_per_sec"],
                        f"local[{hi}]": r_hi["events_per_sec"],
                    }
                )
            last = {"lo": r_lo, "hi": r_hi}
        effs = sorted(p["eff"] for p in pairs)
        median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
        )
        # throughput block comes from the MEDIAN pair (the one whose eff
        # is closest to the reported median), so the published raw seq/s
        # numbers correspond to the reported ratio instead of being
        # cherry-picked from the best pair (ADVICE r02)
        median_pair = min(pairs, key=lambda p: abs(p["eff"] - median_eff))
        sh_effs = sorted(p["eff"] for p in shuffle_pairs)
        sh_median = (
            None
            if not sh_effs
            else sh_effs[len(sh_effs) // 2]
            if len(sh_effs) % 2
            else round((sh_effs[len(sh_effs) // 2 - 1] + sh_effs[len(sh_effs) // 2]) / 2, 3)
        )
        print(json.dumps({
            "metric": f"scaling_efficiency_{lo}_to_{hi}",
            "value": median_eff,
            "unit": "ratio",
            "pairs": pairs,
            "shuffle_job": {
                "job": "asof_join (union + exchange + window carry)",
                "value": sh_median,
                "pairs": shuffle_pairs,
            },
            "throughput": {
                f"local[{lo}]": median_pair[f"local[{lo}]"],
                f"local[{hi}]": median_pair[f"local[{hi}]"],
            },
            "queries": {
                f"local[{lo}]": last["lo"]["queries"],
                f"local[{hi}]": last["hi"]["queries"],
            },
            "sf": last["hi"]["sf"],
            "n_sequences": last["hi"]["n_sequences"],
        }))
        return
    if "--single" in sys.argv:
        p = int(sys.argv[sys.argv.index("--single") + 1])
        amp = (
            int(sys.argv[sys.argv.index("--amplify") + 1])
            if "--amplify" in sys.argv
            else AMPLIFY
        )
        print(json.dumps(run_queries(
            p, amp,
            core_only="--core" in sys.argv,
            flagship_only="--flagship" in sys.argv,
        )))
        return
    print(json.dumps(run_queries(CPUS)))


if __name__ == "__main__":
    main()

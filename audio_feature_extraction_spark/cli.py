"""Command-line entry points (≙ reference CLI, design.md:2440-2456:
``extract`` and ``reconstruct``; plus mix / split / profile).

Usage (also the spark-submit payload — scripts/run_spark_submit.sh):

    python -m audio_feature_extraction_spark.cli extract \
        --input /root/testdata/sf0.001 --output /tmp/out [--config cfg.yaml]
    python -m audio_feature_extraction_spark.cli reconstruct \
        --input /root/testdata/sf0.001 --output /tmp/rec
    python -m audio_feature_extraction_spark.cli mix --input ... --snr 10
    python -m audio_feature_extraction_spark.cli split --input ... --output ...
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.pipeline_config import PipelineConfig
from audio_feature_extraction_spark.core.session import get_spark
from audio_feature_extraction_spark.functions.registry import default_registry
from audio_feature_extraction_spark.operators import (
    framing,
    inverse,
    mixer,
    preprocess,
    split as split_op,
    textstats,
    validate,
)
from audio_feature_extraction_spark.sinks import writers
from audio_feature_extraction_spark.sources.tokens import load_token_sequences


def _load(spark, args, cfg: PipelineConfig):
    ts = load_token_sequences(spark, args.input)
    valid, bad = validate.validate_token_sequences(ts)
    n_bad = bad.count()
    if n_bad:
        print(f"warning: {n_bad} invalid rows dropped", file=sys.stderr)
    p = cfg.preprocess
    if p.trim_threshold is not None or p.target_length is not None:
        valid = preprocess.process(
            valid, p.trim_threshold, p.target_length, p.pad_mode, p.pad_value
        )
    return valid


def cmd_extract(args) -> int:
    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    spark = get_spark(app_name="afes-extract")
    ts = _load(spark, args, cfg)
    if args.channels:
        # channel-layout dataset (≙ HDF5 writer path, 4 formats)
        feats = framing.frame_features(ts, cfg.frame)
        split_col = None
        if args.split:
            feats = split_op.assign_split(feats, "doc_id")
            split_col = "split"
        writers.write_dataset(
            feats,
            args.output,
            fmt=cfg.writer.format,
            split_col=split_col,
            frame_len=cfg.frame.frame_len,
            hop=cfg.frame.hop,
            snapshot=args.snapshot,
        )
    elif args.snapshot:
        # resumable extraction on the atomic snapshot layer: work splits
        # into hash-stable units; each completed unit is one committed
        # snapshot, so a crash mid-run leaves only an invisible staged
        # dir and the rerun picks up exactly the missing units — no
        # duplicates, byte-identical to an uninterrupted run
        from audio_feature_extraction_spark.plans import lineage

        pipe = lineage.SnapshotPipeline(
            spark, args.output, run_id="cli-extract", n_units=args.units
        )
        extractor = default_registry().get(cfg.extractor, cfg.frame)

        def _featurize(df):
            out = extractor(df.drop("unit"))
            if args.split:
                # --split composes with --snapshot (ADVICE r03: it was
                # silently ignored on this branch) — the assignment is a
                # deterministic doc_id hash, so resumed units get the
                # same labels as an uninterrupted run
                out = split_op.assign_split(out, "doc_id")
            return lineage.with_unit(out, "doc_id", args.units)

        pipe.run_stage(ts, "features", "doc_id", _featurize)
        n = pipe.stage_output("features").count()
        print(json.dumps({
            "command": "extract", "rows": n, "output": args.output,
            "resume": "snapshot",
        }))
        spark.stop()
        return 0
    else:
        out = default_registry().get(cfg.extractor, cfg.frame)(ts)
        w = out.write.mode("overwrite")
        if args.split:
            out = split_op.assign_split(out, "doc_id")
            w = out.write.mode("overwrite").partitionBy("split")
        w.parquet(args.output)
    if getattr(args, "snapshot", False) and args.channels:
        from audio_feature_extraction_spark.sinks import snapshots as sn

        n = sn.read_snapshot(spark, args.output).count()
    else:
        n = spark.read.parquet(args.output).count()
    print(json.dumps({"command": "extract", "rows": n, "output": args.output}))
    spark.stop()
    return 0


def cmd_reconstruct(args) -> int:
    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    spark = get_spark(app_name="afes-reconstruct")
    ts = load_token_sequences(spark, args.input)
    frames = framing.frame_table(ts, cfg.frame)
    rec = inverse.reconstruct(frames, cfg.frame)
    rec.write.mode("overwrite").parquet(args.output)
    checked = inverse.roundtrip_check(ts, frames, cfg.frame)
    n_bad = checked.where(~F.col("ok")).count()
    n = checked.count()
    print(json.dumps({"command": "reconstruct", "docs": n, "mismatches": n_bad}))
    spark.stop()
    return 1 if n_bad else 0


def cmd_mix(args) -> int:
    spark = get_spark(app_name="afes-mix")
    ts = load_token_sequences(spark, args.input)
    num = F.regexp_replace("doc_id", "[^0-9]", "").cast("bigint")
    paired = mixer.pair_clean_noise(ts.where(num % 2 == 0), ts.where(num % 2 == 1))
    out = mixer.mix_with_snr(paired, snr_db=args.snr)
    out.select("doc_id", "noise_doc_id", "gain", "mixed").write.mode(
        "overwrite"
    ).parquet(args.output)
    print(json.dumps({"command": "mix", "rows": out.count(), "snr_db": args.snr}))
    spark.stop()
    return 0


def cmd_prepare_corpus(args) -> int:
    """The full pretraining-data pipeline: exact dedup -> near-dup ->
    quality filter -> decontamination -> mixing -> packing, with a
    per-stage accounting report."""
    from audio_feature_extraction_spark.plans import corpus

    spark = get_spark(app_name="afes-prepare-corpus")
    rates = dict(
        (kv.split("=", 1)[0], float(kv.split("=", 1)[1]))
        for kv in (args.rate or [])
    )
    cfg = corpus.CorpusConfig(
        rates=rates,
        default_rate=args.default_rate,
        block_len=args.block_len,
        jaccard_threshold=args.threshold,
        resume_dir=args.resume_dir,
        substring_k=args.substring_k,
        semdedup_threshold=args.semdedup_threshold,
        nb_min_score=args.nb_min_score,
        dsir_k=args.dsir_k,
        bpe_merges=args.bpe_merges,
    )
    mixed, blocks, report = corpus.prepare_corpus(spark, args.input, cfg)
    mixed.write.mode("overwrite").parquet(f"{args.output}/corpus")
    blocks.write.mode("overwrite").parquet(f"{args.output}/blocks")
    print(json.dumps({"command": "prepare-corpus", **report}))
    spark.stop()
    return 0


def cmd_split(args) -> int:
    spark = get_spark(app_name="afes-split")
    ts = load_token_sequences(spark, args.input)
    out = split_op.assign_split(ts, "doc_id")
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    print(json.dumps({"command": "split", "counts": counts}))
    spark.stop()
    return 0


def cmd_pit(args) -> int:
    """Point-in-time feature serving over an events parquet: 'view' rows
    are probes; other rows are feature states; auto skew handling."""
    from audio_feature_extraction_spark.operators import asof

    spark = get_spark(app_name="afes-pit")
    ev = spark.read.parquet(f"{args.input}/events.parquet")
    probes = ev.where(F.col("event_type") == "view")
    states = ev.where(F.col("event_type") != "view")
    out = asof.asof_join_auto(
        probes,
        states,
        strict=args.strict,
        max_staleness_seconds=args.max_staleness,
    )
    out.write.mode("overwrite").parquet(args.output)
    served = out.where(F.col("asof_value").isNotNull()).count()
    total = out.count()
    print(json.dumps({"command": "pit", "probes": total, "served": served}))
    spark.stop()
    return 0


def cmd_profile(args) -> int:
    spark = get_spark(app_name="afes-profile")
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    out = textstats.text_profile(docs)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"command": "profile", "rows": out.count()}))
    spark.stop()
    return 0


def cmd_tokenize(args) -> int:
    """Train a BPE subword vocabulary on the corpus and encode it:
    writes <output>/tokens (doc_id, bpe_ids, n_bpe), <output>/merges
    and <output>/vocab parquet.  Training collapses the corpus to a
    bounded (word, count) histogram (one shuffle); encoding is a
    shuffle-free map."""
    from audio_feature_extraction_spark.operators import bpe

    spark = get_spark(app_name="afes-tokenize")
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    model = bpe.train_bpe(
        docs,
        n_merges=args.merges,
        max_words=args.max_words,
        min_count=args.min_count,
    )
    enc = bpe.bpe_encode(docs, model)
    enc.write.mode("overwrite").parquet(f"{args.output}/tokens")
    model.merges_df(spark).write.mode("overwrite").parquet(
        f"{args.output}/merges"
    )
    model.vocab_df(spark).write.mode("overwrite").parquet(
        f"{args.output}/vocab"
    )
    n_tok = spark.read.parquet(f"{args.output}/tokens").agg(
        F.sum("n_bpe")
    ).collect()[0][0]
    print(json.dumps({
        "command": "tokenize",
        "merges": len(model.merges),
        "vocab": len(model.vocab) + 1,
        "encoded_tokens": int(n_tok or 0),
        "dropped_words": model.dropped_words,
        "dropped_occurrences": model.dropped_occurrences,
    }))
    spark.stop()
    return 0


def cmd_search(args) -> int:
    """BM25/TF-IDF keyword retrieval over the documents corpus with the
    deterministic corpus-derived query workload; writes (query_id,
    rank, doc_id, score) parquet."""
    from audio_feature_extraction_spark.operators import retrieval

    spark = get_spark(app_name="afes-search")
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    out = retrieval.retrieval_topk(
        docs, k=args.k, variant=args.variant,
        n_queries=args.queries, terms_per_query=args.terms,
    )
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"command": "search", "variant": args.variant,
                      "rows": n, "k": args.k}))
    spark.stop()
    return 0


def cmd_probe(args) -> int:
    """Container sniff + real metadata over a (media_id, payload)
    parquet: per-payload container/codec/rate/duration rows, bad
    payloads recorded (not fatal), counts by container printed."""
    from audio_feature_extraction_spark.multimodal.probe import (
        probe_media_metadata,
    )

    spark = get_spark(app_name="afes-probe")
    media = spark.read.parquet(args.input)
    out = probe_media_metadata(media, on_error=args.on_error)
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    by_container = {
        (r.container or "ERROR"): r.n
        for r in written.groupBy("container")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(json.dumps({"command": "probe", "by_container": by_container}))
    spark.stop()
    return 0


def cmd_dedup(args) -> int:
    """MinHash-LSH near-dup report: candidate pairs + exact Jaccard."""
    from audio_feature_extraction_spark.operators import dedup

    spark = get_spark(app_name="afes-dedup")
    ts = load_token_sequences(spark, args.input)
    pairs = dedup.jaccard_on_pairs(
        dedup.lsh_candidate_pairs(ts, max_bucket_size=args.max_bucket), ts
    ).where(F.col("jaccard") >= args.threshold)
    pairs.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"command": "dedup", "pairs": pairs.count(),
                      "threshold": args.threshold}))
    spark.stop()
    return 0


def cmd_decontaminate(args) -> int:
    """Cross-split shingle-overlap report for the deterministic split."""
    from audio_feature_extraction_spark.operators import dedup

    spark = get_spark(app_name="afes-decon")
    tagged = split_op.assign_split(load_token_sequences(spark, args.input))
    out = dedup.contamination(
        tagged.where(F.col("split") == "test"),
        tagged.where(F.col("split") == "train"),
        n=args.ngram,
    )
    out.write.mode("overwrite").parquet(args.output)
    hot = out.where(F.col("overlap") >= args.threshold).count()
    print(json.dumps({"command": "decontaminate", "test_docs": out.count(),
                      "contaminated": hot, "threshold": args.threshold}))
    spark.stop()
    return 0


def cmd_mix_corpus(args) -> int:
    """Weighted domain mixing: --rate web=1.5 --rate books=0.25 ..."""
    from audio_feature_extraction_spark.operators import mixing

    spark = get_spark(app_name="afes-mix-corpus")
    rates = {}
    for spec in args.rate or []:
        src, _, r = spec.partition("=")
        rates[src] = float(r)
    ts = load_token_sequences(spark, args.input)
    out = mixing.sample_by_rates(ts, rates, default=args.default_rate)
    out.write.mode("overwrite").parquet(args.output)
    n_in, n_out = ts.count(), out.count()
    print(json.dumps({"command": "mix-corpus", "docs_in": n_in,
                      "rows_out": n_out, "rates": rates,
                      "default": args.default_rate}))
    spark.stop()
    return 0


def cmd_pack(args) -> int:
    """Sequence-packing manifest into fixed-length training blocks."""
    from audio_feature_extraction_spark.operators import mixing

    spark = get_spark(app_name="afes-pack")
    ts = load_token_sequences(spark, args.input)
    out = mixing.pack_blocks(ts, args.block_len)
    out.write.mode("overwrite").parquet(args.output)
    n_blocks = out.select("source", "block_id").distinct().count()
    print(json.dumps({"command": "pack", "slices": out.count(),
                      "blocks": n_blocks, "block_len": args.block_len}))
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="audio_feature_extraction_spark")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--input", required=True, help="sf dir with documents.parquet")
        sp.add_argument("--output", required=True)
        sp.add_argument("--config", default=None, help="YAML pipeline config")

    sp = sub.add_parser("extract", help="token table -> frame-feature dataset")
    common(sp)
    sp.add_argument("--channels", action="store_true", help="write 4-layout channels")
    sp.add_argument("--split", action="store_true", help="partition by train/val/test")
    sp.add_argument("--snapshot", action="store_true",
                    help="commit via the atomic snapshot table layer; "
                    "without --channels this runs the resumable "
                    "SnapshotPipeline (crash-window-free restart)")
    sp.add_argument("--units", type=int, default=16,
                    help="work units for --snapshot resume granularity")
    sp.set_defaults(fn=cmd_extract)

    sp = sub.add_parser("reconstruct", help="frames -> exact token arrays")
    common(sp)
    sp.set_defaults(fn=cmd_reconstruct)

    sp = sub.add_parser("mix", help="SNR-controlled clean x noise mixing")
    common(sp)
    sp.add_argument("--snr", type=float, default=10.0)
    sp.set_defaults(fn=cmd_mix)

    sp = sub.add_parser("split", help="deterministic train/val/test split")
    common(sp)
    sp.set_defaults(fn=cmd_split)

    sp = sub.add_parser("profile", help="text quality/langid profile")
    common(sp)
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser(
        "tokenize", help="train a BPE subword vocab on the corpus and "
        "encode it (tokens/merges/vocab parquet)"
    )
    common(sp)
    sp.add_argument("--merges", type=int, default=200)
    sp.add_argument("--max-words", type=int, default=1_000_000)
    sp.add_argument("--min-count", type=int, default=1)
    sp.set_defaults(fn=cmd_tokenize)

    sp = sub.add_parser(
        "search", help="BM25/TF-IDF keyword retrieval (corpus-derived "
        "deterministic query workload)"
    )
    common(sp)
    sp.add_argument("--variant", choices=("bm25", "tfidf"), default="bm25")
    sp.add_argument("--k", type=int, default=5)
    sp.add_argument("--queries", type=int, default=5)
    sp.add_argument("--terms", type=int, default=4)
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser(
        "probe", help="media container sniff + metadata (WAV/FLAC/MP3/"
        "OGG/MP4/AVI/MKV/PNG/BMP/JPEG) over a (media_id, payload) parquet"
    )
    common(sp)
    sp.add_argument("--on-error", choices=("skip", "raise"), default="skip")
    sp.set_defaults(fn=cmd_probe)

    sp = sub.add_parser("pit", help="point-in-time feature serving over events")
    common(sp)
    sp.add_argument("--strict", action="store_true",
                    help="strictly-before boundary (a state AT the probe "
                    "timestamp is invisible)")
    sp.add_argument("--max-staleness", type=float, default=None,
                    help="staleness TTL in seconds (stale serves -> null)")
    sp.set_defaults(fn=cmd_pit)

    sp = sub.add_parser("dedup", help="MinHash-LSH near-dup pairs + Jaccard")
    common(sp)
    sp.add_argument("--threshold", type=float, default=0.7)
    sp.add_argument("--max-bucket", type=int, default=1000)
    sp.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser(
        "decontaminate", help="train/test shingle-overlap contamination report"
    )
    common(sp)
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--ngram", type=int, default=8)
    sp.set_defaults(fn=cmd_decontaminate)

    sp = sub.add_parser(
        "mix-corpus", help="weighted domain mixing (--rate src=1.5, repeatable)"
    )
    common(sp)
    sp.add_argument("--rate", action="append")
    sp.add_argument("--default-rate", type=float, default=1.0)
    sp.set_defaults(fn=cmd_mix_corpus)

    sp = sub.add_parser("pack", help="sequence-packing manifest (fixed blocks)")
    common(sp)
    sp.add_argument("--block-len", type=int, default=4096)
    sp.set_defaults(fn=cmd_pack)

    sp = sub.add_parser(
        "prepare-corpus",
        help="full pipeline: dedup -> near-dup -> quality -> "
        "decontaminate -> mix -> pack",
    )
    common(sp)
    sp.add_argument("--rate", action="append",
                    help="source=rate mixing weight (repeatable)")
    sp.add_argument("--default-rate", type=float, default=1.0)
    sp.add_argument("--block-len", type=int, default=4096)
    sp.add_argument("--threshold", type=float, default=0.7,
                    help="near-dup Jaccard confirm threshold")
    sp.add_argument("--resume-dir", default=None,
                    help="commit each stage as an atomic snapshot under "
                    "this dir; a rerun skips committed stages (stage-"
                    "level crash resume)")
    sp.add_argument("--substring-k", type=int, default=None,
                    help="enable substring dedup: cut every span whose "
                    "k-token gram repeats anywhere in the corpus")
    sp.add_argument("--semdedup-threshold", type=float, default=None,
                    help="enable SemDeDup semantic dedup: drop docs "
                    "whose embedding has a same-cluster cosine>=T "
                    "lower-id dominator")
    sp.add_argument("--nb-min-score", type=int, default=None,
                    help="enable the learned Naive-Bayes quality "
                    "filter: drop docs scoring below this bound "
                    "(integer micro-nats; 0 = predicted low quality)")
    sp.add_argument("--dsir-k", type=int, default=None,
                    help="enable DSIR content-based selection: keep "
                    "only the top-k docs under Gumbel-top-k importance "
                    "resampling (log p_target/q_raw hashed-bigram "
                    "weights)")
    sp.add_argument("--bpe-merges", type=int, default=None,
                    help="train a BPE vocab of N merges on the "
                    "surviving docs and pack subword ids (stage 4c)")
    sp.set_defaults(fn=cmd_prepare_corpus)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

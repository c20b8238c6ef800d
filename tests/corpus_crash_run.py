"""Subprocess target for the prepare-corpus kill-and-resume test.

Runs the 6-stage corpus pipeline with stage-level snapshot resume and —
when ``--crash-after N`` is given — SIGKILLs its own process the moment
the N-th stage snapshot commits, simulating a driver crash mid-pipeline
with nothing flushed afterward. A rerun with ``--crash-after 0`` must
resume from the committed stages only and produce output identical to
an uninterrupted run.

Prints one JSON line (the pipeline report + row counts) on success.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("resume_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--crash-after", type=int, default=0,
                    help="SIGKILL self after this many stage commits (0=never)")
    ap.add_argument("--no-resume", action="store_true",
                    help="run the plain single-lazy-plan mode (control run)")
    args = ap.parse_args()

    from audio_feature_extraction_spark.core.session import get_spark
    from audio_feature_extraction_spark.plans import corpus
    from audio_feature_extraction_spark.sinks import snapshots as sn

    if args.crash_after:
        orig = sn.write_snapshot
        commits = {"n": 0}

        def killing_write(*a, **k):
            v = orig(*a, **k)
            commits["n"] += 1
            if commits["n"] >= args.crash_after:
                os.kill(os.getpid(), signal.SIGKILL)  # hard driver death
            return v

        sn.write_snapshot = killing_write

    spark = get_spark("local[8]", app_name="corpus-crash-run")
    cfg = corpus.CorpusConfig(
        accounting=False,
        resume_dir=None if args.no_resume else args.resume_dir,
    )
    mixed, blocks, report = corpus.prepare_corpus(spark, args.sf_dir, cfg)
    mixed.write.mode("overwrite").parquet(f"{args.out_dir}/corpus")
    blocks.write.mode("overwrite").parquet(f"{args.out_dir}/blocks")
    report["corpus_rows"] = spark.read.parquet(f"{args.out_dir}/corpus").count()
    report["block_rows"] = spark.read.parquet(f"{args.out_dir}/blocks").count()
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

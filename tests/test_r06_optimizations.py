"""Focused tests for the round-6 optimization internals.

Each optimization claims bit-identical results through a different
physical plan; these pin the equivalences directly (the driver oracle
rows check the composed queries, these check the changed seams).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators import (
    dedup, mixing, retrieval, textstats,
)


def _tokseq(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_span_dedup_saturated_skip_matches_unfiltered(spark):
    """A fully-duplicated corpus drives the hot-fraction probe to 1.0,
    which takes the r06 skip-the-broadcast-prune branch; its spans must
    equal the prefilter=False direct computation (and stay non-empty)."""
    base = [list(range(i, i + 12)) for i in range(4)]
    rows = []
    for rep in range(3):  # every 8-gram occurs >= 3 times corpus-wide
        for i, t in enumerate(base):
            rows.append((f"doc_{rep}_{i}", t, len(t), "web"))
    ts = _tokseq(spark, rows)
    got = sorted(
        tuple(r)
        for r in dedup.duplicate_gram_spans(ts, k=8).collect()
    )
    want = sorted(
        tuple(r)
        for r in dedup.duplicate_gram_spans(
            ts, k=8, prefilter=False
        ).collect()
    )
    assert got == want and len(got) > 0


def test_nb_fit_kernel_matches_sql_trainer(spark):
    """The numpy fit's literals equal the SQL trainer's collected model
    bit-for-bit (counts exact, shared libm for the closed forms)."""
    rows = [
        (f"doc_{i}", [j % 7 - 3 for j in range(i)] + [i * 31], i + 1, "web")
        for i in range(40)
    ] + [("doc_nodigits", [5, 5, 5], 3, "web")]
    ts = _tokseq(spark, rows)
    kw, kp = textstats._nb_fit_literals_kernel(ts)
    wtab, pri = textstats.nb_train(ts)
    sw, sp = textstats.nb_model_literals(wtab, pri)
    assert kw == sw
    assert kp == sp


def test_dsir_fit_kernel_matches_sql_trainer(spark):
    """Same literal equality for the DSIR lam table."""
    rows = [
        (f"doc_{i}", [(j * 131 - 64) for j in range(i % 9)], i % 9, "web")
        for i in range(40)
    ]
    ts = _tokseq(spark, rows)
    kl = mixing._dsir_fit_literals_kernel(ts)
    sl = {r.b: int(r.lam) for r in mixing.dsir_lambda_table(ts).collect()}
    assert kl == [sl[b] for b in range(mixing.DSIR_BUCKETS)]


def test_retrieval_scalars_from_postings_with_wordless_docs(spark):
    """The materialized path derives n_docs/avgdl from the postings
    relation + a metadata count; wordless docs contribute dl=0 either
    way, so both paths must return identical rows and scores."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha gamma gamma delta epsilon"),
            (3, ""),              # wordless: counted in n_docs, dl 0
            (4, "   "),           # whitespace-only: same
            (5, "beta delta zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    a = sorted(
        tuple(r)
        for r in retrieval.retrieval_topk(
            docs, k=3, n_queries=2, terms_per_query=2, materialize=True
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in retrieval.retrieval_topk(
            docs, k=3, n_queries=2, terms_per_query=2, materialize=False
        ).collect()
    )
    assert a == b and len(a) > 0

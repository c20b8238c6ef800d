"""Text cleaning / PII scrub: semantics + Spark-vs-DuckDB regex parity.

The parity test is the load-bearing one: the patterns are written in
the common Java-regex/RE2 subset, and every adversarial fixture string
must scrub to the SAME bytes through both engines (the driver's
text_scrub contract row hash-compares exactly this).
"""

from __future__ import annotations

import duckdb
import pytest

from audio_feature_extraction_spark.operators import textclean

ADVERSARIAL = [
    "plain words only",
    "",
    "  leading and trailing   ",
    "tabs\tand\nnewlines\r\nand\fformfeed",
    "vtab\x0bstays",                       # \x0b is NOT whitespace here...
    "ctrl\x01\x02chars\x7fgone",           # ...it IS a control char
    "see http://a.b/c?d=e&f=g#h then",
    "https://user:pw@host:8080/p,q;r end",
    "mail me: a.b+c_d%e@sub.domain.org!",
    "no-tld a@b stays as-is",
    "ip 10.0.0.1 and 255.255.255.255.",
    "not-an-ip 1.2.3 or 1.2.3.4.5 edge",   # 1.2.3.4 inside 1.2.3.4.5 matches
    "v1.2.3.4suffix has boundaries",       # \b at digit/letter boundary
    "url-with-ip http://10.1.2.3/x rest",
    "email@10.0.0.1 odd but handled",
    "quote's and \"doubles\" stay",
    "unicode café naïve 中文 stays",
    "HTTP://UPPER.CASE/ not masked (scheme is case-sensitive)",
    "x http://a http://b http://c y",
    "trailing url http://tail.example.com",
]


def test_scrub_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "visit https://x.y/z now"),
            (2, "ping admin@ops.example.com\tasap"),
            (3, "host 192.168.0.1 down\n\n\nbadly"),
            (4, "already clean"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in textclean.scrub_text(df).collect()}
    assert out[1].text_clean == "visit <URL> now"
    assert out[1].n_urls == 1 and out[1].n_emails == 0
    assert out[2].text_clean == "ping <EMAIL> asap"
    assert out[2].n_emails == 1
    assert out[3].text_clean == "host <IP> down badly"
    assert out[3].n_ips == 1
    assert out[4].text_clean == "already clean"


def test_counts_are_on_raw_text(spark):
    # the email inside the URL is consumed by the URL mask, but the
    # count still reports it: counts answer "what does this doc contain"
    df = spark.createDataFrame(
        [(1, "x http://u@h.example.com/p y")], "doc_id int, text string"
    )
    r = textclean.scrub_text(df).collect()[0]
    assert r.text_clean == "x <URL> y"
    assert r.n_urls == 1 and r.n_emails == 1


def test_spark_duckdb_parity_on_adversarial_corpus(spark):
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got_spark = {
        r.doc_id: (r.text_clean, r.n_urls, r.n_emails, r.n_ips)
        for r in textclean.scrub_text(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id INT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got_duck = {
        d: (t, u, e, i)
        for d, t, u, e, i in con.execute(
            "SELECT doc_id, text_clean, n_urls, n_emails, n_ips FROM ("
            + textclean.scrub_oracle_sql("documents")
            + ") _s"
        ).fetchall()
    }
    assert got_spark == got_duck


def test_dirty_text_expr_parity(spark):
    from pyspark.sql import functions as F

    rows = [(7, "base text"), (263, "other doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = {
        r.doc_id: r.dirty
        for r in df.select(
            "doc_id",
            F.expr(textclean.dirty_text_expr(True)).alias("dirty"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got_duck = dict(
        con.execute(
            "SELECT doc_id, "
            + textclean.dirty_text_expr(False)
            + " AS dirty FROM documents"
        ).fetchall()
    )
    assert got_spark == got_duck
    assert "https://ex-7.example.com" in got_spark[7]
    # 263 % 256 == 7: both docs embed the same third octet
    assert "10.7.0.1" in got_spark[7] and "10.7.0.1" in got_spark[263]


def test_scrub_masks_the_dirty_fixture_fully(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(42, "clean words")], "doc_id long, text string")
    dirty = df.select(
        "doc_id", F.expr(textclean.dirty_text_expr(True)).alias("text")
    )
    r = textclean.scrub_text(dirty).collect()[0]
    assert r.text_clean == (
        "clean words see <URL> mail <EMAIL> host <IP> padded tail"
    )
    assert (r.n_urls, r.n_emails, r.n_ips) == (1, 1, 1)


def test_bigram_coverage_hand_case(spark):
    """Familiarity against a reference corpus: counts are exact, repeats
    count per occurrence, unseen bigrams contribute 0 to mean_ref_freq,
    and sub-2-token docs drop out (contamination convention)."""
    from audio_feature_extraction_spark.operators import textstats

    ref = spark.createDataFrame(
        [("r1", [1, 2, 3], 3), ("r2", [1, 2, 4], 3)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    docs = spark.createDataFrame(
        [
            ("d1", [1, 2, 3], 3),        # (1,2) freq 2 known; (2,3) freq 1
            ("d2", [9, 9, 9], 3),        # all unseen
            ("d3", [1, 2, 1, 2], 4),     # (1,2)x2 known, (2,1) unseen
            ("d4", [7], 1),              # no bigrams -> dropped
        ],
        "doc_id string, tokens array<int>, n_tok int",
    )
    out = {
        r.doc_id: (r.n_bigrams, r.n_known, r.coverage, r.mean_ref_freq)
        for r in textstats.bigram_coverage(docs, ref, min_count=2).collect()
    }
    assert set(out) == {"d1", "d2", "d3"}
    assert out["d1"] == (2, 1, 0.5, (2 + 1) / 2)
    assert out["d2"] == (2, 0, 0.0, 0.0)
    assert out["d3"] == (3, 2, 2 / 3, (2 + 0 + 2) / 3)

"""Deterministic splitter (tasks.md:688-709) + skew machinery."""

from __future__ import annotations

from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators import skew, split


def test_split_disjoint_coverage_ratio(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    out = split.assign_split(df, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10000           # full coverage
    assert set(counts) == {"train", "val", "test"}  # disjoint by CASE
    assert abs(counts["train"] / 10000 - 0.8) < 0.02
    assert abs(counts["val"] / 10000 - 0.1) < 0.02
    assert abs(counts["test"] / 10000 - 0.1) < 0.02


def test_split_stable_across_parallelism(spark):
    a = {
        r.doc_id: r.split
        for r in split.assign_split(
            spark.range(0, 1000).withColumnRenamed("id", "doc_id").repartition(1)
        ).collect()
    }
    b = {
        r.doc_id: r.split
        for r in split.assign_split(
            spark.range(0, 1000).withColumnRenamed("id", "doc_id").repartition(16)
        ).collect()
    }
    assert a == b


def test_split_string_ids(spark):
    df = spark.createDataFrame([("doc_7",), ("doc_42",)], "doc_id string")
    out = {r.doc_id: r.split for r in split.assign_split(df, "doc_id").collect()}
    num = {7: out["doc_7"], 42: out["doc_42"]}
    for n, s in num.items():
        b = (n * split.MULT + split.OFF) % split.BUCKETS
        exp = "train" if b < 80 else ("val" if b < 90 else "test")
        assert s == exp


def test_salted_join_equals_plain_join(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )  # 3 hot keys
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, v string")
    plain = set(
        (r.k, r.payload, r.v) for r in big.join(small, "k").collect()
    )
    salted = set(
        (r.k, r.payload, r.v)
        for r in skew.salted_join(big, small, ["k"], 8, big_salt_from="payload").collect()
    )
    assert plain == salted


def test_two_phase_count_equals_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("seq")
    )
    plain = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    two = {r.k: r.n for r in skew.skewed_group_count(df, "k", 8, "seq").collect()}
    assert plain == two


def test_salting_flattens_hot_key(spark):
    """The skew evidence: a hot grouping key concentrates rows in one
    shuffle partition; salting spreads them (partition histogram proof,
    the north-rule 'document per-partition row counts')."""
    n = 20000
    df = spark.range(0, n).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.col("id").cast("string")
        ).alias("k"),
        F.col("id").alias("seq"),
    )
    # unsalted: groupBy(k) puts ~90% of rows in the HOT partition
    plain = df.repartition(16, "k")
    h1 = {r.partition_id: r["count"] for r in skew.partition_histogram(plain).collect()}
    salted = skew.with_salt(df, 16, "seq").repartition(16, "k", "_salt")
    h2 = {r.partition_id: r["count"] for r in skew.partition_histogram(salted).collect()}
    assert max(h1.values()) > 0.85 * n          # skewed before
    assert max(h2.values()) < 0.25 * n          # flattened after
    # and the two-phase aggregate still gets exact counts
    two = {r.k: r.n for r in skew.skewed_group_count(df, "k", 16, "seq").collect()}
    assert two["HOT"] == sum(1 for i in range(n) if i % 10 < 9)


def test_partition_histogram(spark):
    df = spark.range(0, 1000).repartition(8)
    hist = skew.partition_histogram(df).collect()
    assert sum(r["count"] for r in hist) == 1000

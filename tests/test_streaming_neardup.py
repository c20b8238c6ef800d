"""Streaming MinHash-LSH near-dup admission vs the sequential witness.

The hash arithmetic is the batch engine's own (the stream literally
runs ``minhash_signatures`` + ``lsh_band_keys``); what these tests pin
is the ONLINE state machine: first-arrival bucket ownership carried
across micro-batches, doc_id-ordered application within a batch, and
the any-foreign-bucket drop policy — against an independent
sequential-scan witness fed the same engine-computed band keys.
"""

from __future__ import annotations

import pytest

from audio_feature_extraction_spark.operators import dedup as batch_dedup
from audio_feature_extraction_spark.streaming import neardup

SCHEMA = "doc_id string, tokens array<int>"


def _corpus():
    base = list(range(1000, 1100))
    near = base[:95] + [9, 8, 7, 6, 5]       # ~90% shingle overlap w/ base
    far = list(range(5000, 5100))
    other = list(range(9000, 9080))
    batch1 = [("d00", base), ("d01", far)]
    batch2 = [
        ("d02", near),          # near-dup of d00 (cross-batch state)
        ("d03", list(base)),    # exact copy of d00
        ("d04", other),         # fresh
        ("d05", near[:]),       # copy of the DROPPED d02 -> also dropped
    ]
    return batch1, batch2


def _band_rows(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return [
        (r.doc_id, r.band, r.band_key)
        for r in batch_dedup.lsh_band_keys(
            batch_dedup.minhash_signatures(df)
        ).collect()
    ]


def test_stream_matches_sequential_witness(spark, tmp_path):
    batch1, batch2 = _corpus()
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        neardup.stream_lsh_near_dup(stream)
        .writeStream.format("memory")
        .queryName("neardup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
        frags = spark.sql("select * from neardup_out")
        got = {
            r.doc_id: r.is_near_dup
            for r in neardup.near_dup_verdicts(frags).collect()
        }
    finally:
        q.stop()

    order = sorted(d for d, _ in batch1) + sorted(d for d, _ in batch2)
    want = neardup.sequential_witness(
        _band_rows(spark, batch1 + batch2), order
    )
    assert got == want
    # semantic anchors, independent of the witness:
    assert got["d00"] is False and got["d01"] is False
    assert got["d02"] is True            # near-dup across batches
    assert got["d03"] is True            # exact copy
    assert got["d04"] is False           # fresh doc admitted
    assert got["d05"] is True            # copy of a DROPPED doc


def test_fragments_shape_and_ownership(spark, tmp_path):
    """Every doc emits one fragment per band; owners are the doc_id
    minimum over stream history for that bucket."""
    batch1, batch2 = _corpus()
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(batch1 + batch2, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        neardup.stream_lsh_near_dup(stream)
        .writeStream.format("memory")
        .queryName("neardup_frags")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        frags = spark.sql("select * from neardup_frags").collect()
    finally:
        q.stop()
    n_bands = batch_dedup.DEFAULT_MINHASH.bands
    per_doc = {}
    for r in frags:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) == n_bands for v in per_doc.values())
    # owner never exceeds the claiming doc id (first-arrival = min id
    # when replayed in id order)
    for r in frags:
        assert r.owner_doc_id <= r.doc_id
        assert r.fresh == (r.owner_doc_id == r.doc_id)
    # exact copy d03 shares ALL bands with d00
    assert all(r.owner_doc_id == "d00" for r in per_doc["d03"])

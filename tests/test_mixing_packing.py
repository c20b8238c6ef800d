"""Corpus mixing (weighted sampling + epochs) and sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import mixing


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, schema=TOKEN_SEQUENCES)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(200):
        src = ["web", "books", "wiki"][i % 3]
        toks = list(range(i % 7 + 1))
        rows.append((f"doc_{i}", toks, len(toks), src))
    return _mkdf(spark, rows)


def test_mixing_epoch_counts(spark, corpus):
    out = mixing.sample_by_rates(
        corpus, {"web": 2.0, "books": 0.0, "wiki": 0.5}
    )
    per_src = {
        r.source: r.cnt
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    n_web = corpus.where("source = 'web'").count()
    n_wiki = corpus.where("source = 'wiki'").count()
    assert per_src["web"] == 2 * n_web         # exactly two epochs, all docs
    assert "books" not in per_src              # rate 0 drops the domain
    assert 0 < per_src.get("wiki", 0) < n_wiki  # fractional: strict subset
    # epochs are 0-based and dense for integer rates
    webs = out.where("source = 'web'").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("epoch")).alias("es")
    )
    assert all(r.es == [0, 1] for r in webs.collect())


def test_mixing_deterministic(spark, corpus):
    a = sorted(
        (r.doc_id, r.epoch)
        for r in mixing.sample_by_rates(corpus, {"wiki": 0.5}, default=1.0).collect()
    )
    b = sorted(
        (r.doc_id, r.epoch)
        for r in mixing.sample_by_rates(corpus, {"wiki": 0.5}, default=1.0).collect()
    )
    assert a == b


def test_packing_conservation(spark, corpus):
    B = 16
    out = mixing.pack_blocks(corpus, B).collect()
    # every doc's slices cover exactly its tokens, contiguously
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {r.doc_id: r.n_tok for r in corpus.collect()}
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.block_id)
        assert sum(r.slice_len for r in rows) == n_tok[d]
        assert rows[0].doc_offset == 0
        for a, b in zip(rows, rows[1:]):
            assert b.doc_offset == a.doc_offset + a.slice_len
            assert b.block_id == a.block_id + 1
    # every block except the last per source is exactly full
    from collections import defaultdict

    fill = defaultdict(int)
    for r in out:
        fill[(r.source, r.block_id)] += r.slice_len
    for src in {r.source for r in out}:
        blocks = sorted(k[1] for k in fill if k[0] == src)
        for blk in blocks[:-1]:
            assert fill[(src, blk)] == B, (src, blk)
        assert 0 < fill[(src, blocks[-1])] <= B


def test_packing_block_offsets_disjoint(spark, corpus):
    B = 16
    out = mixing.pack_blocks(corpus, B).collect()
    seen = {}
    for r in out:
        key = (r.source, r.block_id)
        seen.setdefault(key, []).append((r.block_offset, r.block_offset + r.slice_len))
    for key, spans in seen.items():
        spans.sort()
        for a, b in zip(spans, spans[1:]):
            assert a[1] == b[0], (key, a, b)  # contiguous, non-overlapping

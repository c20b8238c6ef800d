"""Winnowing local fingerprints (Schleimer et al., SIGMOD 2003).

The load-bearing property is the winnowing guarantee: any token-level
substring match of length >= w + k - 1 between two documents shares at
least one SELECTED gram hash, so ``winnow_pairs`` (an equi-join on the
sparse selected hashes) can never miss a long-enough overlap.  We test
the guarantee on randomized plants, the selection density, the edge
geometry (doc < k tokens, doc inside one window), and exact Spark ==
DuckDB parity on a random corpus (the driver's doc_signatures contract
row hash-compares the same arithmetic).
"""

from __future__ import annotations

import random

import duckdb

from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import textstats
from audio_feature_extraction_spark.operators.textstats import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_pairs,
)


def _mkdf(spark, seqs):
    return spark.createDataFrame(
        [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )


def _guarantee_len(k: int = WINNOW_K, w: int = WINNOW_W) -> int:
    return w + k - 1


def test_short_doc_geometry(spark):
    """< k tokens -> no fingerprints; k..k+w-2 tokens -> exactly one
    window, whose minimum is selected once."""
    seqs = [
        [1, 2, 3],                      # 3 < k=4 tokens: none
        [1, 2, 3, 4],                   # exactly one gram
        list(range(10, 10 + WINNOW_K + WINNOW_W - 2)),  # one full window
    ]
    fp = winnow_fingerprints(_mkdf(spark, seqs)).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert "doc_0" not in by_doc
    assert len(by_doc["doc_1"]) == 1 and by_doc["doc_1"][0].pos == 0
    assert len(by_doc["doc_2"]) == 1  # single window -> single minimum


def test_winnowing_guarantee_randomized(spark):
    """Plant a shared run of exactly w+k-1 tokens at random offsets in
    otherwise-disjoint documents: the pair must share a selected hash."""
    rng = random.Random(20260817)
    glen = _guarantee_len()
    seqs = []
    for trial in range(8):
        shared = [rng.randrange(1, 1 << 18) for _ in range(glen)]
        a_pre = [rng.randrange(1 << 18, 1 << 19) for _ in range(rng.randrange(0, 40))]
        a_post = [rng.randrange(1 << 18, 1 << 19) for _ in range(rng.randrange(0, 40))]
        b_pre = [rng.randrange((1 << 19), (1 << 19) + (1 << 18)) for _ in range(rng.randrange(0, 40))]
        b_post = [rng.randrange((1 << 19), (1 << 19) + (1 << 18)) for _ in range(rng.randrange(0, 40))]
        seqs.append(a_pre + shared + a_post)
        seqs.append(b_pre + shared + b_post)
    fp = winnow_fingerprints(_mkdf(spark, seqs)).collect()
    hashes = {}
    for r in fp:
        hashes.setdefault(r.doc_id, set()).add(r.gram_hash)
    for t in range(8):
        a, b = f"doc_{2 * t}", f"doc_{2 * t + 1}"
        assert hashes[a] & hashes[b], f"trial {t}: guarantee violated"


def test_density_is_sparse_but_covering(spark):
    """Selected count per doc is far below the gram count (that's the
    point) yet positive, and gaps between selected positions never
    exceed w - 1 + (k - 1) ... i.e. consecutive selections are < w
    grams apart (winnowing picks >= 1 per window)."""
    rng = random.Random(7)
    toks = [rng.randrange(1, 1 << 19) for _ in range(400)]
    fp = sorted(
        winnow_fingerprints(_mkdf(spark, [toks])).collect(),
        key=lambda r: r.pos,
    )
    n_grams = len(toks) - WINNOW_K + 1
    assert 0 < len(fp) < n_grams / 2  # expected density 2/(w+1) ~ 0.22
    positions = [r.pos for r in fp]
    for p, q in zip(positions, positions[1:]):
        assert q - p <= WINNOW_W  # a selection in every window


def test_spark_duckdb_parity_random_corpus(spark):
    rng = random.Random(99)
    seqs = [
        [rng.randrange(0, 1 << 19) for _ in range(rng.randrange(0, 60))]
        for _ in range(50)
    ]
    got = {
        (r.doc_id, r.pos, r.gram_hash)
        for r in winnow_fingerprints(_mkdf(spark, seqs)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tokseq AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('doc_{i}', {list(t)}::BIGINT[])" for i, t in enumerate(seqs)
        )
        + ") t(doc_id, tokens)"
    )
    want = {
        (d, p, h)
        for d, p, h in con.execute(textstats.winnow_oracle_sql()).fetchall()
    }
    assert got == want


def test_winnow_pairs_finds_planted_overlap(spark):
    rng = random.Random(3)
    glen = _guarantee_len() + 30          # comfortably long shared block
    shared = [rng.randrange(1, 1 << 18) for _ in range(glen)]
    a = [rng.randrange(1 << 18, 1 << 19) for _ in range(50)] + shared
    b = shared + [rng.randrange(1 << 19, 3 << 18) for _ in range(50)]
    c = [rng.randrange(3 << 18, 1 << 20) for _ in range(120)]
    fp = winnow_fingerprints(_mkdf(spark, [a, b, c]))
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in winnow_pairs(fp, min_shared=1).collect()}
    assert ("doc_0", "doc_1") in pairs
    assert all(k == ("doc_0", "doc_1") for k in pairs)


def test_winnow_pairs_hot_gram_cap(spark):
    """A gram selected by > max_doc_freq docs is dropped before the
    self-join: 70 docs sharing one boilerplate block produce NO pairs at
    max_doc_freq=64 (the bucket would otherwise be ~2400 pairs)."""
    rng = random.Random(11)
    boiler = [rng.randrange(1, 1 << 18) for _ in range(_guarantee_len())]
    seqs = [
        [rng.randrange((1 << 18) + 97 * i, (1 << 18) + 97 * i + 90) for _ in range(20)]
        + boiler
        for i in range(70)
    ]
    fp = winnow_fingerprints(_mkdf(spark, seqs))
    capped = winnow_pairs(fp, min_shared=1, max_doc_freq=64).collect()
    uncapped = winnow_pairs(fp, min_shared=1, max_doc_freq=100).collect()
    # Uncapped: the in-window boiler min is selected by all 70 docs ->
    # the full 70-choose-2 clique.  Capped: that gram is dropped; only
    # boundary-window stragglers (a handful of docs whose boundary
    # window happens to pick the same secondary boiler gram) remain.
    assert len(uncapped) == 70 * 69 // 2
    assert len(capped) < 70  # quadratic blowup removed

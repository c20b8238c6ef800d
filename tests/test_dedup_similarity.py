"""Dedup + similarity + text-analysis operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.config import MinHashSpec
from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import dedup, similarity, textstats

SF = "/root/testdata/sf0.001"


def _mkdf(spark, seqs):
    return spark.createDataFrame(
        [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )


def test_exact_dedup(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique text")],
        "doc_id long, text string",
    )
    groups = dedup.exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].keep_doc_id == 1
    kept = dedup.exact_dedup(docs).collect()
    assert sorted(r.doc_id for r in kept) == [1, 3]


def test_minhash_near_dups_share_bands(spark):
    base = list(range(1000, 1100))
    near = base[:95] + [9, 8, 7, 6, 5]       # ~90% shingle overlap
    far = list(range(5000, 5100))
    df = _mkdf(spark, [base, near, far])
    pairs = {
        (r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(df).collect()
    }
    assert ("doc_0", "doc_1") in pairs        # near-dups collide
    assert ("doc_0", "doc_2") not in pairs    # unrelated don't


def test_lsh_bucket_cap_prevents_blowup(spark):
    """100 near-identical docs: uncapped LSH yields ~n^2/2 pairs; the cap
    excludes the degenerate bucket and accounts for it."""
    base = list(range(3000, 3050))
    df = _mkdf(spark, [base] * 100 + [list(range(7000, 7040))])
    uncapped = dedup.lsh_candidate_pairs(df).count()
    assert uncapped >= 100 * 99 / 2
    capped = dedup.lsh_candidate_pairs(df, max_bucket_size=10).count()
    assert capped == 0
    overflow = dedup.lsh_overflow_buckets(df, max_bucket_size=10).collect()
    assert overflow and all(r.n_docs == 100 for r in overflow)


def test_jaccard_exact_value(spark):
    a = [1, 2, 3, 4, 5]        # shingles {1-2,2-3,3-4,4-5}
    b = [1, 2, 3, 4, 9]        # shingles {1-2,2-3,3-4,4-9}
    df = _mkdf(spark, [a, b])
    pairs = spark.createDataFrame([("doc_0", "doc_1")], "doc_a string, doc_b string")
    out = dedup.jaccard_on_pairs(pairs, df).collect()[0]
    assert out.jaccard == pytest.approx(3 / 5)  # |∩|=3, |∪|=5


def test_simhash_similarity(spark):
    base = list(range(2000, 2100))
    near = base[:97] + [1, 2, 3]
    far = [7, 7, 7] * 40
    df = _mkdf(spark, [base, near, far])
    h = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}

    def hamming(x, y):
        return bin(x ^ y).count("1")

    assert hamming(h["doc_0"], h["doc_1"]) < hamming(h["doc_0"], h["doc_2"])


def test_minhash_signature_width(spark):
    df = _mkdf(spark, [[1, 2, 3], [9]])
    rows = dedup.minhash_signatures(df).collect()
    spec = MinHashSpec()
    assert all(len(r.signature) == spec.num_perm for r in rows)
    # single-token doc has no shingles -> sentinel signature
    sig1 = [r for r in rows if r.doc_id == "doc_1"][0].signature
    assert all(v == spec.prime for v in sig1)


def test_ann_brute_force_topk(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(emb, q, k=3).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].cosine >= out[1].cosine >= out[2].cosine
    assert all(r.neighbor_id != 0 for r in out)


def test_ann_lsh_subset_of_bucket_and_reasonable_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 50)
    brute = similarity.brute_force_topk(emb, q, k=1).collect()
    lsh = similarity.lsh_topk(emb, q, k=1).collect()
    top1_brute = {r.query_id: r.neighbor_id for r in brute}
    top1_lsh = {r.query_id: r.neighbor_id for r in lsh}
    hits = sum(1 for k, v in top1_lsh.items() if top1_brute.get(k) == v)
    # approximate by design; bucket restriction must still find a good
    # fraction of true top-1s on random data with 16 buckets
    assert hits / max(len(top1_lsh), 1) > 0.3


def test_ann_lsh_rerank_recall_beats_plain_lsh(spark):
    """The funnel widens recall (8 tables) without widening exact
    scoring (bounded at C per query): its top-1 recall vs brute force
    must at least match plain 4-table lsh_topk on the same queries, and
    every rank list must be exact-cosine-sorted."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 50)
    brute = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(emb, q, k=1).collect()
    }
    lsh = {
        r.query_id: r.neighbor_id
        for r in similarity.lsh_topk(emb, q, k=1).collect()
    }
    rer = similarity.lsh_rerank_topk(emb, q, k=3).collect()
    rer_top1 = {r.query_id: r.neighbor_id for r in rer if r.rank == 1}
    recall = lambda d: sum(  # noqa: E731
        1 for k_, v in d.items() if brute.get(k_) == v
    ) / max(len(d), 1)
    assert recall(rer_top1) >= recall(lsh)
    assert recall(rer_top1) > 0.5
    by_q: dict = {}
    for r in rer:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for rows in by_q.values():
        rows.sort()
        assert [x[0] for x in rows] == list(range(1, len(rows) + 1))
        assert all(a[1] >= b[1] for a, b in zip(rows, rows[1:]))


def test_ann_lsh_rerank_prune_bound(spark):
    """candidates_per_query truly bounds exact scoring: with C=2 and
    k=5 no query can return more than 2 neighbors."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20)
    out = similarity.lsh_rerank_topk(emb, q, k=5, candidates_per_query=2)
    counts = out.groupBy("query_id").count().collect()
    assert counts and all(r["count"] <= 2 for r in counts)


def test_ann_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 30)
    brute = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(emb, q, k=1).collect()
    }
    ivf = {
        r.query_id: r.neighbor_id
        for r in similarity.ivf_topk(emb, q, k=1, n_lists=16, nprobe=4).collect()
    }
    hits = sum(1 for k_, v in ivf.items() if brute.get(k_) == v)
    # nprobe/n_lists = 1/4 of the table scanned; random data is the
    # worst case for IVF — still expect a solid fraction of exact top-1s
    assert hits / len(ivf) > 0.4


def test_text_profile_signals(spark):
    docs = spark.createDataFrame(
        [(1, "the cat and the dog, in a house.", "en", "s", 32)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = textstats.text_profile(docs).collect()[0]
    assert r.n_words == 8
    assert r.lang_pred == "en"          # 'the' x2, 'and', 'in' markers
    assert 0 < r.stopword_ratio <= 1
    assert r.punct_ratio == pytest.approx(2 / 32)


def test_fingerprint_order_sensitive(spark):
    df = _mkdf(spark, [[1, 2, 3], [3, 2, 1], [1, 2, 3]])
    fps = {r.doc_id: r.fingerprint for r in textstats.fingerprints(df).collect()}
    assert fps["doc_0"] == fps["doc_2"]
    assert fps["doc_0"] != fps["doc_1"]


def test_ann_ivf_pivots_recall_and_shape(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id % 50 = 0")
    brute = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(emb, q, k=1).collect()
    }
    ivf = {
        r.query_id: r.neighbor_id
        for r in similarity.ivf_topk_pivots(emb, q, k=1, n_lists=16, nprobe=4).collect()
    }
    assert set(ivf) <= set(brute)
    hits = sum(1 for k_, v in ivf.items() if brute.get(k_) == v)
    assert hits / len(ivf) > 0.4


def test_ivf_kmeans_fits_on_sample(spark):
    """fit_fraction < 1 must subsample the quantizer fit (VERDICT r01 #2)
    and still produce k results per query."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id % 100 = 0")
    out = similarity.ivf_topk(emb, q, k=3, fit_fraction=0.3).collect()
    per_query = {}
    for r in out:
        per_query.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in per_query.values())


def test_contamination_planted(spark):
    """A test doc sharing half its shingles with train must report the
    exact planted overlap; a disjoint doc reports 0; single-token docs
    (no shingles) drop out."""
    from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
    from audio_feature_extraction_spark.operators import dedup

    train = spark.createDataFrame(
        [("tr_0", [1, 2, 3, 4, 5], 5, "web")], schema=TOKEN_SEQUENCES
    )
    # shingles of contaminated doc: (1,2), (2,3) hit; (100,101), (101,102) miss
    test = spark.createDataFrame(
        [
            ("te_0", [1, 2, 3, 100, 101, 102], 6, "web"),  # hits: (1,2),(2,3)
            ("te_1", [900, 901, 902], 3, "web"),           # disjoint
            ("te_2", [7], 1, "web"),                       # no shingles
        ],
        schema=TOKEN_SEQUENCES,
    )
    out = {r.doc_id: r for r in dedup.contamination(test, train, n=2).collect()}
    assert out["te_0"].n_shingles == 5
    assert out["te_0"].n_matched == 2
    assert out["te_0"].overlap == 2 / 5
    assert out["te_1"].n_matched == 0 and out["te_1"].overlap == 0.0
    assert "te_2" not in out


def test_minhash_kernel_equals_sql(spark):
    """The vectorized kernel and the SQL higher-order-function path are
    bit-identical, including empty/single-token docs (sentinel prime)."""
    from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES

    seqs = [
        list(range(100, 160)),
        [7],            # no shingles -> sentinel
        [1, 2],
        [5, 5, 5, 5],   # duplicate shingles (min unaffected)
        [],
    ]
    df = spark.createDataFrame(
        [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )
    kern = {
        r.doc_id: list(r.signature)
        for r in dedup.minhash_signatures_kernel(df).collect()
    }
    sql = {
        r.doc_id: list(r.signature)
        for r in dedup.minhash_signatures(df).collect()
    }
    assert kern == sql
    assert len(kern) == 5
    assert kern["doc_1"] == [dedup.DEFAULT_MINHASH.prime] * 16


def test_lsh_pairs_kernel_equals_sql_path(spark):
    from audio_feature_extraction_spark.sources.tokens import load_token_sequences

    tok = load_token_sequences(spark, SF)
    k = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(tok, use_kernel=True).collect()
    }
    s = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(tok, use_kernel=False).collect()
    }
    assert k == s and len(k) > 0


def test_lsh_buckets_kernel_equals_sql(spark):
    """Kernel hyperplane buckets == SQL HOF buckets, bit-for-bit (the
    sequential numpy fold reproduces aggregate()'s rounding order)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    kern = {
        (r.vec_id, r.tbl): r.bucket
        for r in similarity.lsh_buckets_kernel(emb, 4, 4, 64).collect()
    }
    texpr = similarity._tables_expr(4, 4, 64)
    from pyspark.sql import functions as F

    sql = {
        (r.vec_id, r.tbl): r.bucket
        for r in emb.select(F.col("vec_id"), F.expr(texpr)).collect()
    }
    assert kern == sql and len(kern) == emb.count() * 4


def test_lsh_topk_kernel_equals_sql_path(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id % 100 = 0")
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.lsh_topk(emb, q, k=5, use_kernel=True).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.lsh_topk(emb, q, k=5, use_kernel=False).collect()
    )
    assert a == b and len(a) > 0


def test_contamination_8gram(spark):
    """Default 8-gram shingles: a verbatim 8-token span from train inside
    a test doc is flagged; short docs (< 8 tokens) have no shingles."""
    from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
    from audio_feature_extraction_spark.operators import dedup

    span = list(range(1, 13))  # 12 tokens -> 5 8-gram shingles
    train = spark.createDataFrame(
        [("tr_0", span, len(span), "web")], schema=TOKEN_SEQUENCES
    )
    test = spark.createDataFrame(
        [
            # first 8 tokens copied verbatim, then diverges
            ("te_0", span[:8] + [500, 501, 502, 503], 12, "web"),
            ("te_1", [900] * 12, 12, "web"),   # disjoint
            ("te_2", list(range(7)), 7, "web"),  # too short for 8-grams
        ],
        schema=TOKEN_SEQUENCES,
    )
    out = {r.doc_id: r for r in dedup.contamination(test, train).collect()}
    assert out["te_0"].n_matched == 1 and out["te_0"].n_shingles == 5
    assert out["te_1"].n_matched == 0
    assert "te_2" not in out


def test_cosine_kernel_equals_sql(spark):
    """cosine_scores_kernel doubles are bit-identical to cosine_expr."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from pyspark.sql import functions as F

    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.col("a.embedding").alias("va"),
            F.col("b.embedding").alias("vb"),
        )
    )
    k = {
        (r.ia, r.ib): r.cosine
        for r in similarity.cosine_scores_kernel(pairs, "va", "vb", 64).collect()
    }
    s = {
        (r.ia, r.ib): r.cosine
        for r in pairs.selectExpr(
            "ia", "ib", f"{similarity.cosine_expr('va', 'vb', spark=True)} as cosine"
        ).collect()
    }
    assert k == s and len(k) > 100  # exact equality, not allclose


def test_kernels_tolerate_ragged_and_null_vectors(spark):
    """ADVICE r02: one malformed (short/NULL) vector used to kill the
    whole job via np.stack. Kernels now drop such rows (on_error='skip'
    semantics) and keep the well-formed output identical."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(20)
    bad = spark.createDataFrame(
        [(90001, [0.5, 0.25]), (90002, None)],
        schema="vec_id bigint, embedding array<double>",
    )
    mixed = emb.select("vec_id", "embedding").unionByName(bad)

    buckets = similarity.lsh_buckets_kernel(mixed, 2, 4, 64).collect()
    good = similarity.lsh_buckets_kernel(
        emb.select("vec_id", "embedding"), 2, 4, 64
    ).collect()
    assert {r.vec_id for r in buckets} == {r.vec_id for r in good}
    assert not {90001, 90002} & {r.vec_id for r in buckets}

    pairs = mixed.alias("a").crossJoin(
        emb.select(F.col("embedding").alias("qvec")).limit(1)
    )
    scored = similarity.cosine_scores_kernel(
        pairs.select("vec_id", "embedding", "qvec"), "embedding", "qvec", 64
    ).collect()
    assert len(scored) == 20 and not {90001, 90002} & {r.vec_id for r in scored}


def test_minhash_kernel_tolerates_null_tokens(spark):
    # the canonical TOKEN_SEQUENCES schema forbids null tokens, but the
    # kernel is also used over ad-hoc frames where the column is nullable
    rows = [("d0", list(range(30)), 30, "web"), ("d1", None, 0, "web")]
    ts = spark.createDataFrame(
        rows, schema="doc_id string, tokens array<int>, n_tok int, source string"
    )
    sigs = {r.doc_id: list(r.signature) for r in
            dedup.minhash_signatures_kernel(ts).collect()}
    assert len(sigs["d0"]) == len(sigs["d1"])
    # null tokens -> empty shingle set -> all-sentinel signature
    assert len(set(sigs["d1"])) == 1


def test_repetition_stats_planted(spark):
    """Planted repetition: a doc of one repeated line maxes the
    dup-line/5-gram fractions; a diverse doc stays near zero."""
    rows = [
        ("rep", "spam spam spam spam spam spam\n" * 6, "en", "web", 180),
        ("div", "one two three four five six seven eight nine ten", "en", "web", 49),
        ("empty", "", "en", "web", 0),
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id string, text string, lang string, source string, n_chars int"
    )
    out = {r.doc_id: r for r in textstats.repetition_stats(docs).collect()}
    r = out["rep"]
    assert r.n_lines == 6 and r.dup_line_frac == pytest.approx(5 / 6)
    assert r.dup_5gram_frac > 0.9          # one gram repeated throughout
    assert r.top_word_frac == 1.0          # every word is 'spam'
    d = out["div"]
    assert d.dup_line_frac == 0.0 and d.dup_5gram_frac == 0.0
    assert d.top_word_frac == pytest.approx(1 / 10)
    e = out["empty"]
    assert e.n_words == 0 and e.dup_line_frac == 0.0
    assert e.top_word_frac is None


def test_connected_components_chain_and_clique(spark):
    """Chain a~b~c merges into one component even though (a, c) was
    never a candidate pair — the case the greedy pair-drop misses."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x"), ("m", "m")],
        "doc_a string, doc_b string",
    )
    comp = {r.doc_id: r.comp for r in dedup.connected_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    ids = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",), ("solo",)], "doc_id string"
    )
    kept = {r.doc_id for r in
            dedup.dedup_survivors_by_component(ids, pairs).collect()}
    assert kept == {"a", "x", "solo"}


def test_connected_components_long_path(spark):
    """A 12-node path needs multiple propagation rounds; labels still
    converge to the global min."""
    nodes = [f"n{i:02d}" for i in range(12)]
    pairs = spark.createDataFrame(
        list(zip(nodes, nodes[1:])), "doc_a string, doc_b string"
    )
    comp = {r.doc_id: r.comp for r in dedup.connected_components(pairs).collect()}
    assert set(comp.values()) == {"n00"} and len(comp) == 12


def test_connected_components_reliable_checkpoint_equivalence(spark, tmp_path):
    """VERDICT r03 #1: the durable-scratch path (checkpoint_dir) labels
    every node identically to the localCheckpoint default, on a graph
    mixing a multi-round path, a clique, and self-loops."""
    nodes = [f"p{i:02d}" for i in range(9)]
    edges = list(zip(nodes, nodes[1:]))                       # 9-node path
    edges += [("c1", "c2"), ("c2", "c3"), ("c1", "c3")]       # clique
    edges += [("z", "z")]                                     # self-loop only
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    local = {r.doc_id: r.comp for r in dedup.connected_components(pairs).collect()}
    durable = {
        r.doc_id: r.comp
        for r in dedup.connected_components(
            pairs, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert durable == local
    assert set(durable.values()) == {"p00", "c1"}  # z has no real edge


def test_connected_components_durable_path_survives_lost_lineage(spark, tmp_path):
    """The reason the durable path exists: with checkpoint_dir the
    returned labels' lineage reaches ONLY the final scratch parquet —
    recomputation never needs the input edges (on a cluster: an executor
    loss costs a task retry, not the whole iterative job). Simulated by
    deleting the input parquet before collecting the result; the
    localCheckpoint analog of this failure is an executor dying, which
    local mode cannot express."""
    import shutil as sh

    src = str(tmp_path / "pairs")
    nodes = [f"q{i}" for i in range(8)]
    spark.createDataFrame(
        list(zip(nodes, nodes[1:])), "doc_a string, doc_b string"
    ).write.parquet(src)
    pairs = spark.read.parquet(src)
    labels = dedup.connected_components(pairs, checkpoint_dir=str(tmp_path / "cc"))
    # lineage independence: physical scan reads the scratch dir, not src
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert "/cc/" in plan and "pairs" not in plan
    sh.rmtree(src)
    spark.catalog.clearCache()
    comp = {r.doc_id: r.comp for r in labels.collect()}  # input is GONE
    assert set(comp.values()) == {"q0"} and len(comp) == 8
    # intermediate rounds were reclaimed: edges + final labels remain,
    # superseded label rounds are deleted
    import os

    left = sorted(os.listdir(tmp_path / "cc"))
    assert left[0] == "cc-0000" and len(left) == 2


# ---------------------------------------------------------------------------
# substring-level span dedup (ExactSubstr analog)
# ---------------------------------------------------------------------------

def _tokseq_df(spark, rows):
    return spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int",
    )


def test_duplicate_gram_spans_cross_doc_and_merge(spark):
    """A 6-token run shared by two docs with k=4: grams at positions
    0..2 of the run are duplicated and merge into ONE span covering the
    whole run in each doc."""
    run = [7, 8, 9, 10, 11, 12]
    rows = [
        ("a", [1, 2] + run + [3]),          # run at positions 2..7
        ("b", run + [4, 5, 6]),             # run at positions 0..5
        ("c", [20, 21, 22, 23, 24]),        # unique
    ]
    spans = {
        (r.doc_id): (r.span_start, r.span_end, r.n_grams)
        for r in dedup.duplicate_gram_spans(_tokseq_df(spark, rows), k=4)
        .collect()
    }
    assert spans == {"a": (2, 8, 3), "b": (0, 6, 3)}


def test_duplicate_gram_spans_within_doc_repetition(spark):
    """Self-repetition counts: one doc repeating a 4-gram twice is its
    own duplicate (min_count=2 over total occurrences)."""
    rows = [("solo", [1, 2, 3, 4, 9, 1, 2, 3, 4])]
    out = sorted(
        (r.span_start, r.span_end)
        for r in dedup.duplicate_gram_spans(_tokseq_df(spark, rows), k=4)
        .collect()
    )
    assert out == [(0, 4), (5, 9)]


def test_duplicate_gram_spans_prefilter_parity(spark):
    """The hash-prefilter scale path returns exactly the unfiltered
    exact result (collisions only ever ADD candidates; the exact pass
    removes them)."""
    rows = [
        ("a", list(range(30)) + [1, 2, 3, 4] * 3),
        ("b", list(range(10, 40))),
        ("c", [1, 2, 3, 4] + list(range(100, 120))),
    ]
    df = _tokseq_df(spark, rows)
    fast = {
        (r.doc_id, r.span_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.duplicate_gram_spans(df, k=4, prefilter=True).collect()
    }
    slow = {
        (r.doc_id, r.span_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.duplicate_gram_spans(df, k=4, prefilter=False).collect()
    }
    assert fast == slow and fast


def test_strip_duplicate_spans_rewrites_tokens(spark):
    rows = [
        ("a", [1, 2, 7, 8, 9, 10, 3]),
        ("b", [7, 8, 9, 10, 4]),
        ("short", [5]),
        ("empty", []),
    ]
    out = {
        r.doc_id: (r.tokens_clean, r.n_kept, r.n_removed)
        for r in dedup.strip_duplicate_spans(_tokseq_df(spark, rows), k=4)
        .collect()
    }
    assert out["a"] == ([1, 2, 3], 3, 4)
    assert out["b"] == ([4], 1, 4)
    assert out["short"] == ([5], 1, 0)
    assert out["empty"] == ([], 0, 0)


def test_pq_topk_recall_and_exactness(spark):
    """Product quantization: (a) with shortlist >= corpus the exact
    re-rank makes PQ IDENTICAL to brute force (the funnel never
    invents neighbors, it only prunes); (b) at the default shortlist
    the recall floor holds even on structureless random embeddings —
    the PQ worst case (real embedding clusters quantize far better)."""
    from audio_feature_extraction_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id % 20 = 0")
    bf = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }

    full = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.pq_topk(emb, q, k=5, shortlist=10_000).collect()
    }
    assert full == bf

    pq = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_topk(emb, q, k=5).collect()
    }
    bf_pairs = {(a, c) for a, _b, c in bf}
    recall = len(pq & bf_pairs) / len(bf_pairs)
    assert recall >= 0.7, recall


def test_pq_codes_are_compact_and_deterministic(spark):
    """The compressed representation: m small integer codes per vector,
    identical across runs (deterministic codebooks, no RNG)."""
    from pyspark.sql import functions as F

    from audio_feature_extraction_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40)
    base = emb.select(
        "vec_id",
        F.expr(similarity.quantized_vec_sql(64, spark=True)).alias("qv"),
    )
    cb = F.broadcast(
        base.where("vec_id < 32").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").cast("int").alias("i"),
                        F.col("qv").alias("c"),
                    )
                )
            ).alias("_cb")
        )
    )
    enc = base.crossJoin(cb).withColumn(
        "codes",
        F.array(
            *[
                F.expr(similarity._pq_enc_expr(j, 4, spark=True))
                for j in range(16)
            ]
        ),
    )
    rows = {r.vec_id: list(r.codes) for r in enc.collect()}
    again = {r.vec_id: list(r.codes) for r in enc.collect()}
    assert rows == again and len(rows) == 40
    for codes in rows.values():
        assert len(codes) == 16
        assert all(0 <= c < 32 for c in codes)
    # a pivot vector's nearest centroid in every subspace is itself
    assert rows[0] == [0] * 16


def test_pq_kernel_path_matches_expression_path(spark):
    """The LUT kernel (O(m) lookups per vector, batch-local shortlists)
    must reproduce the expression path's final top-k EXACTLY — same
    integer ADC, same (adc, id) tie-breaks, same re-ranked cosines."""
    from audio_feature_extraction_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id % 20 = 0")
    expr_path = {
        tuple(r)
        for r in similarity.pq_topk(emb, q, k=5, use_kernel=False).collect()
    }
    kern_path = {
        tuple(r)
        for r in similarity.pq_topk(emb, q, k=5, use_kernel=True).collect()
    }
    assert kern_path == expr_path and len(kern_path) == 125


def test_pq_kernel_shortlist_boundary_ties_keep_lowest_ids(spark):
    """When equal-ADC candidates straddle the shortlist cut, the kernel
    must keep the LOWEST neighbor_ids (the (adc, id) order the
    expression path / oracle uses) — a partial select keyed on adc
    alone can drop id 3 and keep id 10 (ADVICE r04)."""
    import numpy as np

    from audio_feature_extraction_spark.operators import similarity

    # codebook: pivot 0 at the origin, pivot 1 at (10, 10); every tied
    # candidate encodes to pivot 0, so their ADC to the query is equal
    cb = np.array([[0, 0], [10, 10]], dtype=np.int64)
    enc = spark.createDataFrame(
        [(1, [1]), (10, [0]), (7, [0]), (5, [0]), (3, [0])],
        "vec_id bigint, codes array<int>",
    ).coalesce(1)
    out = similarity.pq_adc_scores_kernel(
        enc,
        query_rows=[(99, [10, 10])],
        cb_matrix=cb,
        m=1,
        dsub=2,
        shortlist=3,
    ).collect()
    got = sorted((r.neighbor_id, r.adc) for r in out)
    # adc(pivot1) = 0, adc(pivot0) = 200; the 4-way tie at 200 must
    # surface ids 3 and 5, never 7 or 10
    assert got == [(1, 0), (3, 200), (5, 200)]


def test_pq_kernel_query_cap_fails_fast(spark):
    """use_kernel=True collects the query frame to the driver; above
    max_kernel_queries it must raise with guidance, not OOM the driver
    (VERDICT r04 #5). The cap is a deliberate, overridable bound."""
    import pytest as _pytest

    from audio_feature_extraction_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.limit(8)
    with _pytest.raises(ValueError, match="max_kernel_queries"):
        similarity.pq_topk(
            emb, q, k=3, use_kernel=True, max_kernel_queries=5
        )
    # at or under the cap the funnel runs
    out = similarity.pq_topk(
        emb, q.limit(3), k=3, use_kernel=True, max_kernel_queries=5
    )
    assert out.count() == 9


@pytest.mark.parametrize("gather", [False, True, None])
def test_span_shapes_agree(spark, gather):
    """The two pass-2 physical shapes (direct full-gram explode vs
    hash-prefiltered position gather) and the adaptive default produce
    identical spans on a mixed input with cross-doc dups, within-doc
    repetition, and unique docs."""
    from audio_feature_extraction_spark.operators import dedup

    rows = [
        ("a", list(range(100, 140))),
        ("b", list(range(100, 140))),                  # full dup of a
        ("c", list(range(0, 8)) * 6),                  # self-repetition
        ("d", list(range(500, 560))),                  # unique
        ("e", list(range(110, 130)) + list(range(900, 930))),  # partial
    ]
    tok = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int",
    )
    got = {
        (r.doc_id, r.span_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.duplicate_gram_spans(
            tok, k=8, min_count=2, gather=gather
        ).collect()
    }
    want = {
        (r.doc_id, r.span_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.duplicate_gram_spans(
            tok, k=8, min_count=2, prefilter=False
        ).collect()
    }
    assert got == want and len(want) > 0
    # the partial-dup doc's span covers exactly the shared 20 tokens
    e_spans = [(s, e) for d, _i, s, e, _n in want if d == "e"]
    assert e_spans == [(0, 20)]


@pytest.mark.parametrize("pf", [None, "semi", "bloom"])
def test_contamination_prefilters_agree(spark, pf):
    """The train-side prefilter (broadcast semi or bloom bitmap) must
    not change a single output row — it only drops train shingles that
    could never match (bloom false positives are re-dropped by the
    exact equi-join)."""
    from audio_feature_extraction_spark.operators import dedup, split
    from audio_feature_extraction_spark.sources.tokens import (
        load_token_sequences,
    )

    tagged = split.assign_split(load_token_sequences(spark, SF))
    test_d = tagged.where("split = 'test'")
    train_d = tagged.where("split = 'train'")
    got = {
        r.doc_id: (r.n_shingles, r.n_matched, r.overlap)
        for r in dedup.contamination(test_d, train_d, prefilter=pf).collect()
    }
    base = {
        r.doc_id: (r.n_shingles, r.n_matched, r.overlap)
        for r in dedup.contamination(
            test_d, train_d, prefilter=None
        ).collect()
    }
    assert got == base and len(base) > 0
    assert any(m > 0 for (_s, m, _o) in base.values())


def test_pq_trained_codebook_deterministic_and_exact(spark):
    """train_codebook is deterministic (same input -> bit-identical
    codebook), composes with both pq_topk scoring paths (expression and
    LUT kernel agree exactly on the trained codebook), and on the
    pivots themselves reconstructs code i -> pivot i."""
    import numpy as np

    from audio_feature_extraction_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb1 = similarity.train_codebook(emb, dim=64, m=8, codes=16)
    cb2 = similarity.train_codebook(emb, dim=64, m=8, codes=16)
    assert cb1.shape == (16, 64) and cb1.dtype == np.int64
    assert (cb1 == cb2).all()

    q = emb.where("vec_id % 40 = 0")
    expr_path = {
        tuple(r)
        for r in similarity.pq_topk(
            emb, q, k=5, m=8, codes=16, codebook=cb1, use_kernel=False
        ).collect()
    }
    kern_path = {
        tuple(r)
        for r in similarity.pq_topk(
            emb, q, k=5, m=8, codes=16, codebook=cb1, use_kernel=True
        ).collect()
    }
    assert expr_path == kern_path and len(expr_path) > 0


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-threshold dominance dedup)
# ---------------------------------------------------------------------------

def _np_semdedup(emb_rows, threshold, n_clusters):
    """Pure-numpy witness of the semdedup dominance rule."""
    import numpy as np

    ids = np.array([r[0] for r in emb_rows])
    vecs = np.array([r[1] for r in emb_rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    cents = vecs[ids < n_clusters]
    cent_ids = ids[ids < n_clusters]
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    # ties -> lowest centroid id (cent_ids sorted ascending)
    cl = cent_ids[np.argmin(d, axis=1)]
    norms = np.sqrt((vecs**2).sum(axis=1))
    pairs = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cl[i] != cl[j]:
                continue
            cos = float(vecs[i] @ vecs[j] / (norms[i] * norms[j]))
            if cos >= threshold and ids[j] not in pairs:
                pairs[int(ids[j])] = (int(ids[i]), cos)
    return pairs


@pytest.mark.parametrize("use_kernel", [False, True])
def test_semdedup_matches_bruteforce(spark, use_kernel):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    got = {
        r.id_b: (r.id_a, r.cosine)
        for r in similarity.semdedup_pairs(
            emb, threshold=0.2, n_clusters=8,
            use_kernel=use_kernel, score_kernel=use_kernel,
        ).collect()
    }
    want = _np_semdedup(rows, 0.2, 8)
    assert set(got) == set(want)
    for b, (a, cos) in want.items():
        assert got[b][0] == a
        assert abs(got[b][1] - cos) < 1e-9


def test_semdedup_kernel_bit_identical_to_expression(spark):
    """The Arrow assignment/scoring kernels and the HOF expression path
    must agree to the BIT (same fold order, same tie-breaks)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    k = similarity.semdedup_pairs(
        emb, threshold=0.2, n_clusters=16, use_kernel=True, score_kernel=True
    )
    e = similarity.semdedup_pairs(
        emb, threshold=0.2, n_clusters=16, use_kernel=False
    )
    rk = sorted((r.id_a, r.id_b, r.cosine) for r in k.collect())
    re_ = sorted((r.id_a, r.id_b, r.cosine) for r in e.collect())
    assert rk == re_                      # includes exact float equality


def test_semdedup_one_row_per_dropped_and_survivors(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    out = similarity.semdedup_pairs(emb, threshold=0.2, n_clusters=16)
    rows = out.collect()
    dropped = [r.id_b for r in rows]
    assert len(dropped) == len(set(dropped))     # exactly one row per drop
    for r in rows:
        assert r.id_a < r.id_b and r.cosine >= 0.2
    # survivor set is everything minus the dropped ids
    assert n - len(dropped) > 0


# ---------------------------------------------------------------------------
# Naive-Bayes quality classifier
# ---------------------------------------------------------------------------

def _np_nb_quality(tok_rows):
    """Pure-python witness (math.log == glibc libm == both engines)."""
    import math

    V, A, B = (
        textstats.NB_BUCKETS,
        textstats.NB_MULT,
        textstats.NB_OFF,
    )
    labeled = []
    for doc_id, tokens in tok_rows:
        lab = 1 if len(set(tokens)) * 2 >= len(tokens) else 0
        labeled.append((doc_id, tokens, lab))
    train = [
        (d, t, l)
        for d, t, l in labeled
        if (int("".join(ch for ch in d if ch.isdigit())) * 9973 + 12345) % 100 < 80
    ]
    c = {(lab, b): 0 for lab in (0, 1) for b in range(V)}
    n1 = n0 = d1 = d0 = 0
    for _, tokens, lab in train:
        if lab:
            d1 += 1
        else:
            d0 += 1
        for t in tokens:
            c[(lab, (t * A + B) % V)] += 1
            if lab:
                n1 += 1
            else:
                n0 += 1
    w = {
        b: math.floor(
            1e6
            * (
                math.log(c[(1, b)] + 1)
                - math.log(n1 + V)
                - math.log(c[(0, b)] + 1)
                + math.log(n0 + V)
            )
        )
        for b in range(V)
    }
    prior = math.floor(1e6 * (math.log(d1 + 1) - math.log(d0 + 1)))
    out = {}
    for doc_id, tokens, lab in labeled:
        if not tokens:
            continue
        s = prior + sum(w[(t * A + B) % V] for t in tokens)
        out[doc_id] = (lab, s, 1 if s > 0 else 0)
    return out


def test_nb_quality_matches_python_witness(spark):
    from audio_feature_extraction_spark.sources.tokens import (
        load_token_sequences,
    )

    ts = load_token_sequences(spark, SF)
    tok_rows = [(r.doc_id, list(r.tokens)) for r in ts.collect()]
    got = {
        r.doc_id: (r.weak_label, r.nb_score_micro, r.predicted)
        for r in textstats.nb_quality(ts).collect()
    }
    want = _np_nb_quality(tok_rows)
    assert got == want


def test_nb_quality_learns_separable_signal(spark):
    # class 1: all-distinct tokens from a low range; class 0: heavy
    # repetition from a high range -> buckets separate the classes and
    # the learned scores should recover the weak labels almost exactly.
    seqs = []
    for i in range(60):
        if i % 2 == 0:
            seqs.append(list(range(100 + i, 100 + i + 20)))       # distinct
        else:
            seqs.append([20000 + i] * 20)                         # repeated
    ts = _mkdf(spark, seqs)
    out = textstats.nb_quality(ts).collect()
    assert len(out) == 60
    agree = sum(1 for r in out if r.predicted == r.weak_label)
    assert agree >= 54   # >= 90% on a cleanly separable corpus


def test_nb_model_roundtrips_through_parquet(spark, tmp_path):
    """Feature-store reuse: a trained model written to parquet and read
    back scores byte-identically to the in-plan model."""
    from audio_feature_extraction_spark.sources.tokens import (
        load_token_sequences,
    )

    ts = load_token_sequences(spark, SF)
    wtab, pri = textstats.nb_train(ts)
    wtab.write.parquet(f"{tmp_path}/wtab")
    pri.write.parquet(f"{tmp_path}/pri")
    fresh = textstats.nb_score(
        ts,
        spark.read.parquet(f"{tmp_path}/wtab"),
        spark.read.parquet(f"{tmp_path}/pri"),
    )
    inline = textstats.nb_quality(ts)
    a = sorted(map(tuple, fresh.collect()))
    b = sorted(map(tuple, inline.collect()))
    assert a == b


def test_semdedup_cell_cap_prevents_blowup(spark):
    """A degenerate corpus (one embedding mode) funnels everything into
    one cell; the cap excludes that cell and accounts for it."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(100)]
    rows.append((100, [0.0, 1.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = similarity.semdedup_pairs(
        emb, threshold=0.9, n_clusters=2
    ).count()
    assert uncapped == 99                       # one dominance row per copy
    capped = similarity.semdedup_pairs(
        emb, threshold=0.9, n_clusters=2, max_cell_size=10
    ).count()
    assert capped == 0
    overflow = similarity.semdedup_overflow_cells(
        emb, n_clusters=2, max_cell_size=10
    ).collect()
    # both pivots are copies of the mode vector, so the tie-break puts
    # every vector (outlier included) in cell 0: one 101-vec cell
    assert overflow and all(r.n_vecs == 101 for r in overflow)

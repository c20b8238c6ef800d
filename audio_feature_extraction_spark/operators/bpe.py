"""Byte-pair-encoding subword tokenizer: corpus-scale training and
distributed encoding.

The tokens axis needs a real tokenizer, not just token *counts*: a
pretraining pipeline trains a subword vocabulary ON the corpus it is
cleaning.  BPE's scale structure maps onto Spark cleanly, and it is the
same structure every production trainer (SentencePiece, HF tokenizers)
uses:

1. **Word histogram** — the only corpus-sized stage: explode whitespace
   words, ``groupBy(word).count()`` (one shuffle, map-side combine).
   100 TB of text collapses to |distinct words| rows.
2. **Driver-side merge loop** — classic Gage/Sennrich BPE over the
   (word, count) table: repeatedly merge the most frequent adjacent
   symbol pair.  The table is bounded (``max_words`` most frequent
   words, with the dropped tail COUNTED and reported, never silent),
   so the loop is O(vocab target x table size) python — exactly how
   real trainers run, because merge selection is inherently sequential.
   Determinism: ties break on (count DESC, pair lexicographic ASC).
3. **Distributed encode** — stateless map over documents: broadcast the
   merge ranks, encode each word by applying merges in rank order
   (lowest rank wins each step, leftmost occurrence first — the GPT-2
   reference order), with a per-Arrow-batch memo so each distinct word
   in a batch is encoded once.  No shuffle at all: the 100 TB encode is
   embarrassingly parallel.

Vocabulary ids are deterministic: id 0 = UNK, then single characters of
the training alphabet in code-point order, then merged tokens in merge
rank order.  ``decode`` is concatenation — round-trip identity over the
training alphabet is property-tested.

The iteration-0 statistic (adjacent character-pair counts weighted by
word frequency) is pure SQL on both engines — ``pair_counts_sql`` —
and drives the ``gram_stats`` contract variant ``bpe_pair``; the merge
LOOP itself is sequential-by-nature and is verified against an
independent python witness plus hand-worked classics instead
(tests/test_bpe.py).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import _words

UNK_ID = 0


# ---------------------------------------------------------------------------
# Stage 1: word histogram (the only corpus-sized stage)
# ---------------------------------------------------------------------------


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace words — one shuffle with map-side
    partial aggregation."""
    return (
        docs.selectExpr(f"explode({_words(text_col, True)}) as word")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


# ---------------------------------------------------------------------------
# Stage 2: the merge loop (driver-side over the bounded histogram)
# ---------------------------------------------------------------------------


def _pair_stats(words: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for sym, cnt in words.items():
        for a, b in zip(sym, sym[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + cnt
    return stats


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    max_words: int = 1_000_000,
    min_count: int = 1,
    text_col: str = "text",
) -> "BpeModel":
    """Train a BPE vocabulary on the corpus.

    The histogram is bounded to the ``max_words`` most frequent words
    (ties to the lexicographically smaller word) with ``min_count``
    floor; the dropped tail's word/occurrence counts are recorded on
    the returned model (``dropped_words`` / ``dropped_occurrences``) —
    bounded-with-accounting, never silent truncation.
    """
    hist = word_histogram(docs, text_col=text_col).where(
        F.col("count") >= min_count
    )
    # TakeOrdered, not a full sort; the collect is bounded by max_words
    # (the driver-side table real trainers hold in memory anyway).
    top = hist.orderBy(F.desc("count"), F.asc("word")).limit(max_words).collect()
    totals = hist.agg(
        F.count("*").alias("w"), F.sum("count").alias("occ")
    ).collect()[0]
    if totals["w"] == 0:
        # empty corpus: a valid (if useless) model with no merges
        return BpeModel(merges=[], alphabet=[])
    kept_occ = sum(r["count"] for r in top)
    words: dict[tuple[str, ...], int] = {}
    for r in top:
        words[tuple(r["word"])] = words.get(tuple(r["word"]), 0) + r["count"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(words)
        if not stats:
            break
        # ties: count DESC, then pair lexicographic ASC
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {_merge_word(s, best): c for s, c in words.items()}
    alphabet = sorted({c for w in words for tok in w for c in tok})
    return BpeModel(
        merges=merges,
        alphabet=alphabet,
        dropped_words=int(totals["w"]) - len(top),
        dropped_occurrences=int(totals["occ"]) - kept_occ,
    )


class BpeModel:
    """Trained merges + deterministic vocabulary.

    ids: 0 = UNK; 1..|alphabet| = training alphabet in code-point
    order; then one id per merge in rank order.
    """

    def __init__(
        self,
        merges: list[tuple[str, str]],
        alphabet: list[str],
        dropped_words: int = 0,
        dropped_occurrences: int = 0,
    ):
        self.merges = list(merges)
        self.alphabet = list(alphabet)
        self.dropped_words = dropped_words
        self.dropped_occurrences = dropped_occurrences
        self.ranks = {p: i for i, p in enumerate(self.merges)}
        self.vocab: dict[str, int] = {}
        for c in self.alphabet:
            self.vocab[c] = len(self.vocab) + 1
        for a, b in self.merges:
            tok = a + b
            if tok not in self.vocab:
                self.vocab[tok] = len(self.vocab) + 1

    # -- single-word encode (the reference order: lowest-rank merge
    # first; within a rank, leftmost occurrence first) ----------------
    def encode_word(self, word: str) -> list[str]:
        sym = list(word)
        while len(sym) > 1:
            ranked = [
                (self.ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
                if (a, b) in self.ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        return sym

    def encode_word_ids(self, word: str) -> list[int]:
        return [self.vocab.get(t, UNK_ID) for t in self.encode_word(word)]

    def decode_tokens(self, tokens: Iterable[str]) -> str:
        return "".join(tokens)

    # -- DataFrame artifacts ------------------------------------------
    def merges_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(self.merges)],
            "rank int, left string, right string",
        )

    def vocab_df(self, spark: SparkSession) -> DataFrame:
        rows = [(UNK_ID, "<unk>")] + [(i, t) for t, i in self.vocab.items()]
        return spark.createDataFrame(rows, "token_id int, token string")

    @classmethod
    def from_merges_rows(cls, rows, alphabet: list[str]) -> "BpeModel":
        ordered = sorted(rows, key=lambda r: r[0])
        return cls([(r[1], r[2]) for r in ordered], alphabet)


# ---------------------------------------------------------------------------
# Stage 3: distributed encode (stateless map, zero shuffle)
# ---------------------------------------------------------------------------


def bpe_encode(
    docs: DataFrame, model: BpeModel, text_col: str = "text"
) -> DataFrame:
    """(doc_id, bpe_ids array<int>, n_bpe int) — every whitespace word
    encoded with the trained merges; characters outside the training
    alphabet become UNK_ID.

    Plan shape: ``mapInPandas`` with the merge ranks broadcast in the
    closure and a per-batch word memo — each distinct word is encoded
    once per Arrow batch, and the stage has no exchange at any scale.
    """
    ranks = model.ranks
    vocab = model.vocab

    def encode_word_ids(word: str, memo: dict[str, list[int]]) -> list[int]:
        got = memo.get(word)
        if got is None:
            sym = list(word)
            while len(sym) > 1:
                ranked = [
                    (ranks[(a, b)], i)
                    for i, (a, b) in enumerate(zip(sym, sym[1:]))
                    if (a, b) in ranks
                ]
                if not ranked:
                    break
                _, i = min(ranked)
                sym[i : i + 2] = [sym[i] + sym[i + 1]]
            got = [vocab.get(t, UNK_ID) for t in sym]
            memo[word] = got
        return got

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[str, list[int]] = {}
            ids = []
            for text in pdf["text"]:
                toks: list[int] = []
                for w in (text or "").split(" "):
                    if w:
                        toks.extend(encode_word_ids(w, memo))
                ids.append(toks)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bpe_ids": ids,
                    "n_bpe": [len(t) for t in ids],
                }
            )

    return docs.selectExpr("doc_id", f"{text_col} as text").mapInPandas(
        run, schema="doc_id long, bpe_ids array<int>, n_bpe int"
    )


# ---------------------------------------------------------------------------
# Iteration-0 pair counts — the SQL-expressible statistic
# ---------------------------------------------------------------------------


def pair_counts_sql(spark: bool, docs_rel: str = "documents",
                    text_col: str = "text") -> str:
    """Adjacent-character pair counts over whitespace words, weighted
    by occurrence — BPE's first merge is the argmax of this table.
    Pairs are emitted as code points (t1, t2) so the result joins the
    integer-typed ``gram_stats`` contract union.
    """
    words = _words(text_col, spark)
    if spark:
        return (
            f"SELECT ascii(substring(w, i, 1)) AS t1, "
            f"ascii(substring(w, i + 1, 1)) AS t2, "
            f"count(*) AS freq FROM "
            f"(SELECT explode({words}) AS w FROM {docs_rel}) _w "
            f"LATERAL VIEW explode(sequence(1, length(w) - 1)) _i AS i "
            f"WHERE length(w) >= 2 "
            f"GROUP BY 1, 2"
        )
    return (
        f"SELECT ascii(w[i]) AS t1, ascii(w[i + 1]) AS t2, "
        f"count(*) AS freq FROM "
        f"(SELECT unnest({words}) AS w FROM {docs_rel}) _w, "
        f"unnest(range(1, length(w))) _t(i) "
        f"WHERE length(w) >= 2 "
        f"GROUP BY 1, 2"
    )


def pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    docs.createOrReplaceTempView("_bpe_docs")
    return docs.sparkSession.sql(
        pair_counts_sql(True, "_bpe_docs", text_col)
    )

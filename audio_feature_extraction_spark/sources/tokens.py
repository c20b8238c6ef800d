"""Token-sequence source (≙ AudioFileLoader, design.md:451-475).

The driver's ``documents`` parquet (doc_id:int64, text, lang, source,
n_chars) is deterministically tokenized into the canonical input table
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`` from
BASELINE.json ``input_hint``.

The tokenizer is a *cross-engine pure-SQL* word hash — the exact same
arithmetic runs in Spark SQL, DuckDB SQL, and numpy, so the DuckDB oracle
can reproduce token arrays bit-for-bit (verified by tests).  This mirrors
the reference's boundary conversion discipline (TensorConverter,
design.md:306-518): one well-defined ingestion transform, identical
everywhere.

At 100 TB the ``documents`` scan is the widest input; the derivation is a
narrow map (no shuffle), so it parallelizes with input splits for free —
the multi-file parallel load of design.md:2388-2389.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.config import DEFAULT_TOKENIZER, TokenizerSpec


def tokenize_expr(spec: TokenizerSpec = DEFAULT_TOKENIZER, text_col: str = "text") -> Column:
    """Spark Column: text -> array<int> of word-hash tokens."""
    return F.expr(tokenize_sql_spark(spec, text_col))


def tokenize_sql_spark(spec: TokenizerSpec = DEFAULT_TOKENIZER, text_col: str = "text") -> str:
    """Spark-SQL fragment computing the token array."""
    return (
        f"transform(filter(split({text_col}, ' '), w -> length(w) > 0), "
        f"w -> cast((ascii(w)*{spec.first_mult} + length(w)*{spec.len_mult} "
        f"+ ascii(substring(w, -1, 1))) % {spec.vocab} as int))"
    )


def tokenize_sql_duckdb(spec: TokenizerSpec = DEFAULT_TOKENIZER, text_col: str = "text") -> str:
    """DuckDB-SQL fragment computing the *identical* token array."""
    return (
        f"list_transform(list_filter(string_split({text_col}, ' '), w -> length(w) > 0), "
        f"w -> CAST((ascii(w)*{spec.first_mult} + length(w)*{spec.len_mult} "
        f"+ ascii(w[-1])) % {spec.vocab} AS INTEGER))"
    )


def tokenize_py(text: str, spec: TokenizerSpec = DEFAULT_TOKENIZER) -> list[int]:
    """Single-threaded Python oracle of the same tokenizer (for tests)."""
    out = []
    for w in text.split(" "):
        if not w:
            continue
        out.append(
            (ord(w[0]) * spec.first_mult + len(w) * spec.len_mult + ord(w[-1]))
            % spec.vocab
        )
    return out


def load_token_sequences(
    spark: SparkSession,
    sf_dir: str,
    spec: TokenizerSpec = DEFAULT_TOKENIZER,
) -> DataFrame:
    """Canonical input table from the driver's documents parquet.

    Narrow transform over the scan — `.explain` shows a single
    WholeStageCodegen project over the FileScan (column-pruned to
    text/doc_id/source), no shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokenize_expr(spec)
    return docs.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("source").alias("source"),
    )


def token_sequences_duckdb_cte(
    sf_dir: str, spec: TokenizerSpec = DEFAULT_TOKENIZER
) -> str:
    """DuckDB CTE body producing the identical token table (oracle side).

    Note the driver pre-registers ``documents`` as a view over the same
    parquet, so we reference the view name, not the path.
    """
    toks = tokenize_sql_duckdb(spec)
    return (
        f"SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, "
        f"{toks} AS tokens, "
        f"CAST(len({toks}) AS INTEGER) AS n_tok, "
        f"source FROM documents"
    )


# Shared CTE prefix used by every oracle query that consumes the token table.
TOKSEQ_CTE = "WITH tokseq AS (" + token_sequences_duckdb_cte("") + ")"

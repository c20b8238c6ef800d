"""Corpus mixing + sequence packing — training-data composition ops.

Beyond the reference (its corpus is per-file audio), but first-class for
the engine's target workload: an LLM pretraining pipeline composes its
corpus from weighted domain mixtures (rate < 1 downsamples a domain,
rate > 1 repeats it for multiple epochs) and then packs documents into
fixed-length training blocks.

Everything is deterministic and integer-exact, so both ops carry full
DuckDB value oracles:

* sampling decisions come from a quadratic product-form hash of the
  numeric doc id (an affine form mod a small denominator degenerates on
  arithmetic id sequences — see noise_inject_expr);
* packing offsets are integer prefix sums over a fixed (source, doc_id)
  order.

Scale shape: ``sample_by_rates`` is a narrow map + filter (no shuffle).
``pack_blocks`` is one window prefix-sum per source partition — the same
single-exchange shape as sessionize/backfill; a pathologically hot
source falls back to the segmented-scan trick (temporal.backfill_bucketed)
if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_PRIME = 1000003
DENOM = 10_000  # rate resolution 1/10000


def _rate_hash(num_expr: str, epoch_expr: str, seed: int) -> str:
    """Product-form hash in [0, DENOM) — identical in Spark and DuckDB.

    Both factors are reduced mod HASH_PRIME *before* the multiply, so
    every intermediate is provably < 2^41: the raw ``(num+1)*(num+...)``
    form is ~num^2 and would exceed int64 once a numeric doc-id suffix
    passes ~2^31 — Spark BIGINT wraps silently there while DuckDB raises,
    i.e. engine/oracle divergence (ADVICE r02). For ids below ~10^6 the
    reduced form is numerically identical to the raw one, so existing
    oracle values are unchanged. Depends on (doc, epoch) so each extra
    epoch's fractional keep-set is independent."""
    n = f"(({num_expr}) % {HASH_PRIME})"
    m = f"(({n} + 1009 + ({epoch_expr}) * 131) % {HASH_PRIME})"
    return f"((({n} + 1) * {m} + {seed}) % {HASH_PRIME}) % {DENOM}"


def sample_rate_case(rates: dict[str, float], default: float) -> str:
    """CASE expression mapping source -> mixing rate (works verbatim in
    both dialects). Empty rate maps collapse to the default literal —
    a branchless CASE is a parse error in both engines."""
    if not rates:
        return f"({default!r})"
    branches = " ".join(
        f"WHEN '{s}' THEN {r!r}" for s, r in sorted(rates.items())
    )
    return f"CASE source {branches} ELSE {default!r} END"


def sample_by_rates(
    tokseq: DataFrame,
    rates: dict[str, float],
    default: float = 1.0,
    seed: int = 7,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mixing: keep/repeat docs per source rate.

    rate r emits floor(r) full copies of every doc (epochs 0..floor(r)-1)
    plus one extra copy of a deterministic hash(doc, epoch) fraction
    (r - floor(r)) of docs. Output = input columns + ``epoch``.

    Narrow: the epoch fan-out is a generator expression, the fractional
    keep is a filter — no shuffle, no RNG, rerun-stable.
    """
    num = f"CAST(regexp_replace({id_col}, '[^0-9]', '') AS BIGINT)"
    rate = sample_rate_case(rates, default)
    # threshold in DENOM units; epochs 0..ceil(r)-1, last one is partial
    thresh = f"CAST(round(({rate}) * {DENOM}) AS BIGINT)"
    h = _rate_hash(num, "e", seed)
    keep = f"(e + 1) * {DENOM} <= {thresh} OR {h} < {thresh} - e * {DENOM}"
    # rate <= 0 guard: Spark's sequence(0, -1) DESCENDS instead of being
    # empty, which would fabricate an epoch -1 row
    frag = (
        f"CASE WHEN {thresh} <= 0 THEN array() ELSE "
        f"filter(transform(sequence(0, CAST(ceil({rate}) AS INT) - 1), "
        f"e -> CASE WHEN {keep} THEN e END), e -> e IS NOT NULL) END"
    )
    return tokseq.select(
        "*", F.explode(F.expr(frag)).alias("epoch")
    )


def sample_by_rates_oracle_sql(
    rates: dict[str, float],
    default: float = 1.0,
    seed: int = 7,
    from_clause: str = "tokseq",
) -> str:
    num = "CAST(regexp_replace(doc_id, '[^0-9]', '', 'g') AS BIGINT)"
    rate = sample_rate_case(rates, default)
    thresh = f"CAST(round(({rate}) * {DENOM}) AS BIGINT)"
    h = _rate_hash(num, "e", seed)
    return (
        f"SELECT t.*, CAST(e AS INTEGER) AS epoch FROM {from_clause} t, "
        f"unnest(range(0, CAST(ceil({rate}) AS BIGINT))) AS g(e) "
        f"WHERE (e + 1) * {DENOM} <= {thresh} OR {h} < {thresh} - e * {DENOM}"
    )


def sample_quota(
    tokseq: DataFrame,
    n_per_source: int,
    seed: int = 7,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """EXACT-quota stratified sampling: the first ``n_per_source`` docs
    per source in deterministic hash order (rate-based mixing keeps an
    EXPECTED fraction; eval-set carving and per-domain caps need an
    exact count). Hash order — not id order — so the sample is
    uniform-ish over each stratum yet rerun-stable, engine-identical,
    and stable under appends ONLY of later-hashing docs (the usual
    reservoir caveat; re-carve after big appends).

    Scale shape: one rank window per source partition — the same single
    exchange as sessionize; no RNG, no collect. Output = input columns
    + ``sample_rank`` (1-based within source).
    """
    from pyspark.sql import Window

    num = f"CAST(regexp_replace({id_col}, '[^0-9]', '') AS BIGINT)"
    h = _rate_hash(num, "0", seed)
    w = Window.partitionBy(source_col).orderBy(F.expr(h), F.col(id_col))
    return (
        tokseq.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_source)
    )


def sample_quota_oracle_sql(
    n_per_source: int, seed: int = 7, from_clause: str = "tokseq"
) -> str:
    num = "CAST(regexp_replace(doc_id, '[^0-9]', '', 'g') AS BIGINT)"
    h = _rate_hash(num, "0", seed)
    # NULLS FIRST pins the one dialect default that differs (Spark asc
    # = nulls first, DuckDB asc = nulls last) for digitless doc ids
    return (
        f"SELECT * FROM (SELECT t.*, CAST(row_number() OVER ("
        f"PARTITION BY source ORDER BY {h} NULLS FIRST, doc_id) "
        f"AS INTEGER) AS sample_rank FROM {from_clause} t) _q "
        f"WHERE sample_rank <= {n_per_source}"
    )


def pack_blocks(
    tokseq: DataFrame,
    block_len: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence-packing manifest: documents concatenate in (source,
    doc_id) order into fixed ``block_len`` training blocks; a doc spans
    every block its token range intersects (GPT-style packing where
    documents cross block boundaries).

    Output: one row per (doc, block) slice —
    (source, block_id, doc_id, doc_offset, block_offset, slice_len);
    a writer gathers slices by (source, block_id) to emit padded-free
    training rows. Integer prefix sums only — oracle-exact.
    """
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_off = (
        tokseq.where(F.col("n_tok") > 0)
        .withColumn("_end", F.sum(F.col("n_tok").cast("long")).over(w))
        .withColumn("_start", F.col("_end") - F.col("n_tok"))
    )
    b = block_len
    frag = (
        f"inline(transform(sequence(_start div {b}, (_end - 1) div {b}), "
        f"blk -> struct(cast(blk as bigint) as block_id, "
        # slice of THIS doc that lands in block blk
        f"cast(greatest(blk * {b}, _start) - _start as int) as doc_offset, "
        f"cast(greatest(blk * {b}, _start) - blk * {b} as int) as block_offset, "
        f"cast(least((blk + 1) * {b}, _end) - greatest(blk * {b}, _start) as int) "
        f"as slice_len)))"
    )
    return with_off.select(source_col, id_col, F.expr(frag))


def pack_blocks_oracle_sql(
    block_len: int, from_clause: str = "tokseq"
) -> str:
    """CTE continuation — prepend ``WITH tokseq AS (...), `` when composing."""
    b = block_len
    return (
        f"offs AS (SELECT source, doc_id, "
        # DuckDB's sum(BIGINT) is HUGEINT — pin back to BIGINT for range()
        f"CAST(sum(CAST(n_tok AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS _end, "
        f"CAST(n_tok AS BIGINT) AS n_tok FROM {from_clause} WHERE n_tok > 0) "
        f"SELECT source, doc_id, blk AS block_id, "
        f"CAST(greatest(blk * {b}, _end - n_tok) - (_end - n_tok) AS INTEGER) AS doc_offset, "
        f"CAST(greatest(blk * {b}, _end - n_tok) - blk * {b} AS INTEGER) AS block_offset, "
        f"CAST(least((blk + 1) * {b}, _end) - greatest(blk * {b}, _end - n_tok) AS INTEGER) "
        f"AS slice_len "
        f"FROM offs, unnest(range((_end - n_tok) // {b}, (_end - 1) // {b} + 1)) AS g(blk)"
    )

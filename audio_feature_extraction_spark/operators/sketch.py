"""Mergeable sketches — distinct counting that survives 100 TB.

``COUNT(DISTINCT token)`` is exact but its shuffle carries every
distinct value; at corpus scale the pipeline answer is a HyperLogLog
register table: 64 integers that merge associatively (max per
register), so the shuffle is O(m) per partition regardless of input
size, and sketches from different days/shards union by element-wise
max without rescanning anything.

Engine twist: this HLL is CROSS-ENGINE EXACT, like every other operator
here. The usual implementation hashes with murmur/xxhash and estimates
with float math no second engine reproduces; this one uses

* the engine's affine integer hash (``(t*A + B) % P``, < 2^62 — exact
  in Spark, DuckDB, and python),
* ``rho`` (leading-zero rank) via BINARY-STRING LENGTH, an integer
  (``bin()`` exists in both dialects; no float log2),
* registers as a ``groupBy(bucket).max(rho)`` — pure integers,
* the harmonic-mean estimate as a SEQUENTIAL FOLD over the register
  array in bucket order (``2^-M`` terms are exact powers of two; the
  fold order is pinned, so the double rounds identically),
* libm ``ln`` for the small-range linear-counting correction (glibc ==
  Spark JVM == DuckDB, the established _db_sql precedent),

so the ESTIMATE itself — not just the registers — is value-identical in
both engines and the whole sketch is hash-oracle-checkable.

Standard HLL (Flajolet et al. 2007): m=64 buckets, alpha_64 = 0.709,
linear counting below 2.5m. Expected relative error ~1.04/sqrt(64) =
13%; the contract row carries the exact distinct count alongside so the
error is visible, not trusted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 64                      # registers (2^6)
HLL_ALPHA = 0.709               # alpha_64, Flajolet et al. Fig. 3
# affine-then-SQUARE hash onto [0, P): rho needs bit-level avalanche,
# and a chain of affine rounds mod P composes back into ONE affine map
# (arithmetic-progression inputs stay arithmetic progressions — their
# leading-zero ranks are badly non-geometric and the estimate biases
# ~2x; measured). The square mod a prime is the cheapest non-linear
# mixer that both engines evaluate exactly: x = (t*A1 + B) % P spreads
# the input (t < 2^31, product < 2^61), x1 = x % (2^31-1) bounds the
# square (x1^2 < 2^62), h = (x1^2 + x) % P. P prime just under 2^40
# leaves 34 value bits after the 6 bucket bits. All intermediates
# < 2^62; measured relative error 2-14% across AP/sequential/packed
# inputs, consistent with the 13% standard error.
HLL_A1 = 1103515245
HLL_B = 2654435769
HLL_P = 1099511627689           # prime < 2^40
_M31 = 2147483647               # 2^31 - 1, square-bound reducer
_VBITS = 34                     # value bits after the 6 bucket bits


def _hash_sql(col: str) -> str:
    x = f"(CAST({col} AS BIGINT) * {HLL_A1} + {HLL_B}) % {HLL_P}"
    return (
        f"((({x}) % {_M31}) * (({x}) % {_M31}) + ({x})) % {HLL_P}"
    )


def _rho_sql(v: str) -> str:
    """Leading-zero rank of the 44-bit value: VBITS - bitlen(v) + 1,
    all-zero value pinned to VBITS + 1. bitlen via bin() string length
    — integer-exact, same text in both dialects."""
    return (
        f"CASE WHEN {v} = 0 THEN {_VBITS + 1} "
        f"ELSE {_VBITS} - length(bin({v})) + 1 END"
    )


def hll_registers(
    tokseq: DataFrame, col_expr: str = "explode(tokens)"
) -> DataFrame:
    """(bucket, register) — the mergeable state. One tiny shuffle:
    map-side partial max collapses every partition to <= m rows.
    Sketches merge by unioning register tables and re-taking the max."""
    h = _hash_sql("t")
    return (
        tokseq.selectExpr(f"{col_expr} as t")
        .selectExpr(f"{h} as h")
        .selectExpr(
            f"cast(h % {HLL_M} as int) as bucket",
            f"h div {HLL_M} as v",
        )
        .selectExpr("bucket", f"{_rho_sql('v')} as rho")
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def _estimate_sql(rarr: str, spark: bool) -> str:
    """HLL estimate from ``rarr`` (a length-m register array in bucket
    order, missing buckets = 0): pinned-fold harmonic mean + linear-
    counting correction. Identical arithmetic text both dialects."""
    m, a = HLL_M, HLL_ALPHA
    if spark:
        s = (
            f"aggregate(transform({rarr}, r -> "
            f"pow(cast(2.0 as double), -r)), cast(0.0 as double), "
            f"(acc, t) -> acc + t)"
        )
        zeros = f"size(filter({rarr}, r -> r = 0))"
    else:
        s = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({rarr}, r -> pow(CAST(2.0 AS DOUBLE), -r))), "
            f"(acc, t) -> acc + t)"
        )
        zeros = f"len(list_filter({rarr}, r -> r = 0))"
    raw = f"({a} * {m} * {m} / {s})"
    lc = f"({m} * ln(CAST({m} AS DOUBLE) / {zeros}))"
    return (
        f"CASE WHEN {raw} <= {2.5 * m} AND {zeros} > 0 "
        f"THEN {lc} ELSE {raw} END"
    )


# bigram code expression (the bigram_stats packing): exercises the raw
# harmonic-mean regime — unigram vocab on synthetic corpora sits in the
# linear-counting range
_BIGRAM_EXPLODE = (
    "explode(transform(filter(sequence(1, size(tokens)), "
    "i -> i < size(tokens)), i -> bigint(element_at(tokens, cast(i as int)))"
    " * 32768 + element_at(tokens, cast(i+1 as int))))"
)


def _hll_pair(tokseq: DataFrame, col_expr: str, tag: str) -> DataFrame:
    regs = hll_registers(tokseq, col_expr)
    rarr_df = regs.agg(
        F.expr(
            f"transform(sequence(0, {HLL_M - 1}), j -> coalesce("
            f"element_at(map_from_arrays(collect_list(bucket), "
            f"collect_list(register)), j), 0))"
        ).alias("rarr")
    )
    est = rarr_df.selectExpr(
        f"'hll_{tag}_est' as k",
        f"cast(floor({_estimate_sql('rarr', True)}) as bigint) as n",
    )
    exact = (
        tokseq.selectExpr(f"{col_expr} as t")
        .agg(F.countDistinct("t").alias("n"))
        .selectExpr(f"'distinct_{tag}_exact' as k", "n")
    )
    return exact.unionByName(est)


def hll_distinct_tokens(tokseq: DataFrame) -> DataFrame:
    """Long-format corpus rows: exact distinct counts next to their HLL
    estimates (floored to integer counts), for unigram tokens (linear-
    counting regime on synthetic vocab) AND packed bigram codes (raw
    harmonic regime). The exact branches are the expensive shuffles the
    sketch replaces at scale — both ship so the contract row PROVES the
    estimate's error instead of asserting it."""
    return _hll_pair(tokseq, "explode(tokens)", "tokens").unionByName(
        _hll_pair(tokseq, _BIGRAM_EXPLODE, "bigrams")
    )


_BIGRAM_LIST = (
    "list_transform(range(1, len(tokens)), "
    "i -> CAST(tokens[i] AS BIGINT) * 32768 + tokens[i+1])"
)


def hll_oracle_sql(tok_from: str = "tokseq") -> str:
    """DuckDB twin: registers CTE -> dense array CTE -> same estimate,
    for unigram tokens and packed bigram codes. CTE fragment —
    concatenate after ``WITH tokseq AS (...)`` with a comma, like the
    dedup oracles."""
    v = f"hh // {HLL_M}"
    est = _estimate_sql("rarr", spark=False)
    ctes, sels = [], []
    for tag, src in (
        ("tokens", f"SELECT u.t AS t FROM {tok_from} t, "
                   f"unnest(t.tokens) AS u(t)"),
        ("bigrams", f"SELECT u.t AS t FROM (SELECT {_BIGRAM_LIST} AS bs "
                    f"FROM {tok_from}) t, unnest(t.bs) AS u(t)"),
    ):
        regs = (
            f"SELECT CAST(hh % {HLL_M} AS INTEGER) AS bucket, "
            f"max({_rho_sql(v)}) AS register "
            f"FROM (SELECT {_hash_sql('src.t')} AS hh "
            f"FROM ({src}) src) _h GROUP BY 1"
        )
        rarr = (
            f"SELECT list(coalesce(r.register, 0) ORDER BY g.j) AS rarr "
            f"FROM (SELECT unnest(range(0, {HLL_M})) AS j) g "
            f"LEFT JOIN hregs_{tag} r ON g.j = r.bucket"
        )
        ctes.append(f"hregs_{tag} AS ({regs}), harr_{tag} AS ({rarr})")
        sels.append(
            f"SELECT 'distinct_{tag}_exact' AS k, "
            f"CAST(count(DISTINCT src.t) AS BIGINT) AS n FROM ({src}) src "
            f"UNION ALL SELECT 'hll_{tag}_est' AS k, "
            f"CAST(floor({est}) AS BIGINT) AS n "
            f"FROM (SELECT rarr FROM harr_{tag}) _a"
        )
    return f"{', '.join(ctes)} {' UNION ALL '.join(sels)}"


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency estimation / heavy hitters
# ---------------------------------------------------------------------------
# The frequency twin of the HLL above: d x w integer counters that
# merge by element-wise ADDITION, so per-shard sketches union without
# rescanning and the shuffle is O(d*w) rows per partition regardless of
# input size. Estimate = min over the d rows of the counter each row
# hashes the key into (Cormode & Muthukrishnan 2005); the one-sided
# guarantee est >= exact always holds and is asserted in tests. Unlike
# the HLL estimate there is NO float arithmetic anywhere — counters and
# estimates are plain integers, so cross-engine exactness is free.
#
# Row hashes reuse the affine+square mixer documented at HLL_A1 with
# per-row classic public LCG multipliers (Numerical Recipes / glibc /
# Borland constants); key < 2^31 keeps every product < 2^62.

CMS_D = 4
CMS_W = 1024
CMS_AS = (1103515245, 1664525, 22695477, 69069)


def _cms_hash_sql(col: str, r: int, width: int = CMS_W) -> str:
    x = f"(CAST({col} AS BIGINT) * {CMS_AS[r]} + {HLL_B}) % {HLL_P}"
    mixed = f"((({x}) % {_M31}) * (({x}) % {_M31}) + ({x})) % {HLL_P}"
    return f"CAST(({mixed}) % {width} AS INTEGER)"


def cms_counters(
    stream: DataFrame,
    key_col: str = "t",
    weight_col: str = "w",
    width: int = CMS_W,
) -> DataFrame:
    """(r, b, cnt) — the mergeable state, <= CMS_D * CMS_W rows. One
    tiny shuffle (map-side partial sum); sketches from different shards
    merge by unioning and re-summing per (r, b)."""
    structs = ", ".join(
        f"struct({r} as r, {_cms_hash_sql(key_col, r, width)} as b)"
        for r in range(CMS_D)
    )
    return (
        stream.selectExpr(
            f"explode(array({structs})) as rb", f"{weight_col} as w"
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def cms_topk(
    stream: DataFrame,
    k: int = 20,
    key_col: str = "t",
    weight_col: str = "w",
    width: int = CMS_W,
) -> DataFrame:
    """Top-k heavy hitters by CMS estimate, exact counts alongside:
    (token, cms_est, exact_freq), ordered (est DESC, token) with a
    deterministic boundary cut.

    The candidate set here is the exact per-key aggregate — the shuffle
    the sketch replaces at scale — shipped ON PURPOSE so the contract
    row proves the one-sided error (est >= exact) instead of asserting
    it. At 100 TB candidates come from a per-partition local top-k
    (Misra-Gries style) unioned across shards, and only the counter
    table (CMS_D x CMS_W rows, broadcastable forever) is global state.
    Selection is orderBy+limit = TakeOrdered, never a global sort."""
    counters = cms_counters(stream, key_col, weight_col, width)
    exact = (
        stream.groupBy(F.col(key_col).alias("token"))
        .agg(F.sum(weight_col).cast("long").alias("exact_freq"))
    )
    structs = ", ".join(
        f"struct({r} as r, {_cms_hash_sql('token', r, width)} as b)"
        for r in range(CMS_D)
    )
    est = (
        exact.selectExpr(
            "token", "exact_freq", f"explode(array({structs})) as rb"
        )
        .join(
            F.broadcast(counters),
            (F.col("rb.r") == counters.r) & (F.col("rb.b") == counters.b),
        )
        .groupBy("token", "exact_freq")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select("token", "cms_est", "exact_freq")
        .orderBy(F.desc("cms_est"), "token")
        .limit(k)
    )


def cms_oracle_sql(
    k: int = 20,
    stream_cte: str = "cms_stream",
    width: int = CMS_W,
    tag: str = "cms",
) -> str:
    """DuckDB twin over a (t, w) stream CTE named ``stream_cte``:
    counters -> per-key min estimate -> same (est DESC, token) cut.
    CTE fragment + final SELECT, concatenated after the stream CTE;
    ``tag`` prefixes the CTE names so two sketch variants can share one
    WITH chain."""
    branches = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_hash_sql('t', r, width)} AS b, w "
        f"FROM {stream_cte}"
        for r in range(CMS_D)
    )
    est_branches = " UNION ALL ".join(
        f"SELECT token, exact_freq, {r} AS r, "
        f"{_cms_hash_sql('token', r, width)} AS b FROM {tag}_exact"
        for r in range(CMS_D)
    )
    return (
        f"{tag}_cnt AS (SELECT r, b, CAST(sum(w) AS BIGINT) AS cnt "
        f"FROM ({branches}) _s GROUP BY 1, 2), "
        f"{tag}_exact AS (SELECT t AS token, CAST(sum(w) AS BIGINT) AS "
        f"exact_freq FROM {stream_cte} GROUP BY 1), "
        f"{tag}_est AS (SELECT e.token, e.exact_freq, min(c.cnt) AS cms_est "
        f"FROM ({est_branches}) e JOIN {tag}_cnt c ON e.r = c.r AND e.b = c.b "
        f"GROUP BY 1, 2) "
        f"SELECT token, cms_est, exact_freq FROM {tag}_est "
        f"ORDER BY cms_est DESC, token LIMIT {k}"
    )

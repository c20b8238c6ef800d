"""Sequence preprocessing (≙ AudioPreprocessor, design.md:784-910).

* normalize    — scale by global max-abs (design.md:830-835)
* trim         — drop sub-threshold leading/trailing span (design.md:837-859)
* adjust_length — pad (constant / replicate / reflect) or center-crop to a
  target length (design.md:861-910; modes 884-904)
* process      — composed trim -> normalize? -> fix-length with
  original_length lineage (design.md:784-828)

All pure SQL expressions (both Spark and DuckDB dialects) — narrow maps,
no shuffle, whole-stage codegen.  ``reflect``/``replicate`` use modular
index folding instead of a Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAD_MODES = ("constant", "replicate", "reflect")


def normalize_expr(spark: bool, col: str = "tokens") -> str:
    """tokens -> array<double> scaled by 1/max(|t|); zero-max passes through
    (reference: `if max > 0` guard, design.md:832-835)."""
    if spark:
        mx = f"array_max(transform({col}, x -> abs(x)))"
        return (
            f"case when {mx} > 0 then transform({col}, x -> x / cast({mx} as double)) "
            f"else transform({col}, x -> cast(x as double)) end"
        )
    mx = f"list_max(list_transform({col}, x -> abs(x)))"
    return (
        f"CASE WHEN {mx} > 0 THEN list_transform({col}, x -> x / CAST({mx} AS DOUBLE)) "
        f"ELSE list_transform({col}, x -> CAST(x AS DOUBLE)) END"
    )


def trim_expr(threshold: int, spark: bool, col: str = "tokens") -> str:
    """Keep span [first index with t >= threshold, last such index]
    (≙ energy-threshold silence trim, design.md:837-859). All-below rows
    yield an empty array (reference returns the empty span)."""
    if spark:
        hits = f"filter(sequence(1, size({col})), i -> element_at({col}, cast(i as int)) >= {threshold})"
        return (
            f"case when size({hits}) = 0 then array() "
            f"else slice({col}, array_min({hits}), array_max({hits}) - array_min({hits}) + 1) end"
        )
    hits = f"list_filter(range(1, len({col}) + 1), i -> {col}[i] >= {threshold})"
    return (
        f"CASE WHEN len({hits}) = 0 THEN [] "
        f"ELSE {col}[list_min({hits}) : list_max({hits})] END"
    )


def adjust_length_expr(
    target: int, mode: str, pad_value: int, spark: bool, col: str = "tokens"
) -> str:
    """Pad or center-crop to exactly ``target`` tokens.

    Crop: start = (n - target) div 2 (design.md:906-908).
    Pad modes (design.md:884-904): constant -> pad_value; replicate -> edge
    value; reflect -> mirror without edge repeat, period 2(n-1), numpy
    semantics. n = 1 degenerates to replicate (period 0).
    """
    if mode not in PAD_MODES:
        raise ValueError(f"mode must be one of {PAD_MODES}, got {mode!r}")
    n = f"size({col})" if spark else f"len({col})"
    elem = (lambda i: f"element_at({col}, cast(({i}) + 1 as int))") if spark else (
        lambda i: f"{col}[({i}) + 1]"
    )
    if mode == "constant":
        fill = str(pad_value)
    elif mode == "replicate":
        fill = elem(f"{n} - 1")
    else:  # reflect: j = i mod 2(n-1); idx = j if j < n else 2(n-1) - j
        per = f"(2 * ({n} - 1))"
        j = f"pmod(i, {per})" if spark else f"((i % {per}) + {per}) % {per}"
        fill = (
            f"CASE WHEN {n} = 1 THEN {elem('0')} "
            f"WHEN {j} < {n} THEN {elem(j)} "
            f"ELSE {elem(f'{per} - {j}')} END"
        )
    idx_body = f"CASE WHEN i < {n} THEN {elem('i')} ELSE {fill} END"
    if spark:
        pad = f"transform(sequence(0, {target - 1}), i -> {idx_body})"
        crop = f"slice({col}, ({n} - {target}) div 2 + 1, {target})"
        return f"case when {n} >= {target} then {crop} else {pad} end"
    pad = f"list_transform(range(0, {target}), i -> {idx_body})"
    start = f"(({n} - {target}) // 2 + 1)"
    crop = f"{col}[{start} : {start} + {target} - 1]"
    return f"CASE WHEN {n} >= {target} THEN {crop} ELSE {pad} END"


def adjust_frames(
    features: DataFrame,
    target_frames: int,
    spec_n_buckets: int,
    crop: str = "center",
    pad_db: float = -80.0,
) -> DataFrame:
    """Pad the frame grid with constant dB rows or crop to exactly
    ``target_frames`` frames per doc (≙ SpectrogramPreprocessor
    ._adjust_frames, design.md:1143-1236; pad value −80 dB at 1152,
    center/random crop 1226-1234).

    'random' crop start is a deterministic hash of doc_id (SURVEY §7.3 —
    no live RNG). Long-format: crop = filter on frame_id range; pad =
    union of synthesized rows. One window for per-doc counts, no extra
    shuffle beyond the doc partitioning."""
    if crop not in ("center", "random"):
        raise ValueError(f"crop must be center|random, got {crop!r}")
    w = Window.partitionBy("doc_id")
    df = features.withColumn("_n", F.max("frame_id").over(w) + 1)
    if crop == "center":
        start = ((F.col("_n") - target_frames) / 2).cast("int")
    else:
        start = F.pmod(
            F.xxhash64("doc_id"),
            F.greatest(F.col("_n") - target_frames + 1, F.lit(1)),
        ).cast("int")
    cropped = (
        df.where(F.col("_n") >= target_frames)
        .where(
            (F.col("frame_id") >= start)
            & (F.col("frame_id") < start + target_frames)
        )
        .withColumn("frame_id", (F.col("frame_id") - start).cast("int"))
    )
    short = df.where(F.col("_n") < target_frames)
    pad_row_src = (
        short.groupBy("doc_id")
        .agg(F.max("_n").alias("_n"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("_n"), F.lit(target_frames - 1))
            ).alias("frame_id"),
        )
        .select(
            "doc_id",
            F.col("frame_id").cast("int").alias("frame_id"),
            F.expr("array()").cast("array<int>").alias("frame_tokens"),
            F.expr(
                f"transform(sequence(1, {spec_n_buckets}), x -> cast({pad_db} as double))"
            ).alias("features"),
            F.expr(
                "cast(null as struct<mean:double, std:double, min:int, max:int, "
                "distinct_ratio:double>)"
            ).alias("stats"),
        )
    )
    keep_cols = ["doc_id", "frame_id", "frame_tokens", "features", "stats"]
    return (
        cropped.select(*keep_cols)
        .unionByName(short.select(*keep_cols))
        .unionByName(pad_row_src)
    )


def process(
    df: DataFrame,
    trim_threshold: int | None = None,
    target_length: int | None = None,
    pad_mode: str = "constant",
    pad_value: int = 0,
) -> DataFrame:
    """Composed preprocessing with original-length lineage
    (≙ AudioPreprocessor.process, design.md:784-828: trim -> adjust,
    metadata['original_length'] kept as the untouched ``n_tok``)."""
    out = df.withColumn("original_length", F.col("n_tok"))
    if trim_threshold is not None:
        out = out.withColumn("tokens", F.expr(trim_expr(trim_threshold, spark=True)))
    if target_length is not None:
        out = out.withColumn(
            "tokens",
            F.expr(adjust_length_expr(target_length, pad_mode, pad_value, spark=True)),
        )
    return out.withColumn("n_tok", F.size("tokens").cast("int"))

"""Exact inverse framing — reconstruct token arrays from the frame table.

≙ ISTFT overlap-add reconstruction (design.md:630-744; StreamBuffer
``update_overlap`` design.md:1959-1982, which emits ``hop`` samples per
step).  In the integer-token domain the overlap-add weighting degenerates
to take-first-occurrence per position (SURVEY §7.3), so frame ``f > 0``
contributes exactly its last ``hop`` tokens (the non-overlapping tail) and
frame 0 contributes everything — the same "emit hop per step" recurrence,
made exact.

The round-trip invariant is *exact token-array equality* (input_hint; the
reference's analog is SNR > 30 dB, requirements.md:183 SC-13).

Scale notes: one shuffle (groupBy doc_id); contributions are pre-sliced so
shuffle volume ≈ original token volume (each position shipped once), not
frame_len/hop × amplified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.config import DEFAULT_FRAME, FrameSpec


def _contrib_expr(spec: FrameSpec, spark: bool) -> str:
    """New (non-overlapped) positions contributed by each frame."""
    l, h = spec.frame_len, spec.hop
    if spark:
        return (
            f"case when frame_id = 0 then frame_tokens "
            f"else slice(frame_tokens, {l - h} + 1, {h}) end"
        )
    return (
        f"CASE WHEN frame_id = 0 THEN frame_tokens "
        f"ELSE frame_tokens[{l - h} + 1 : {l}] END"
    )


def reconstruct(frames: DataFrame, spec: FrameSpec = DEFAULT_FRAME) -> DataFrame:
    """Frame table -> (doc_id, tokens) with exact original arrays.

    Single shuffle: contributions are computed narrow, then one
    groupBy(doc_id) assembles ordered segments.
    """
    if spec.center:
        raise ValueError(
            "reconstruct requires the standard (first-occurrence invertible) "
            "grid; centered frames overlap-reflect at boundaries and are not "
            "exactly invertible"
        )
    contrib = _contrib_expr(spec, spark=True)
    return (
        frames.selectExpr("doc_id", "frame_id", f"{contrib} as contrib")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(frame_id, contrib))),"
                " s -> s.contrib))"
            ).alias("tokens")
        )
    )


def reconstruct_oracle_sql(
    spec: FrameSpec = DEFAULT_FRAME, frames_from: str = "frames"
) -> str:
    """DuckDB SQL computing the identical reconstruction."""
    contrib = _contrib_expr(spec, spark=False)
    return (
        f"SELECT doc_id, flatten(array_agg(({contrib}) ORDER BY frame_id)) AS tokens "
        f"FROM {frames_from} GROUP BY doc_id"
    )


def reconstruct_with_params(frames: DataFrame, params: DataFrame) -> DataFrame:
    """J4 — reconstruction-parameter join (design.md:1601-1630): feature
    rows join their stored frame/hop params before inversion, so mixed-
    grid datasets invert correctly.

    ``params``: (doc_id, frame_len, hop) dimension table — broadcast (it
    is tiny next to the frame table, as the reference's per-sample attrs
    are tiny next to tensors).
    """
    joined = frames.join(F.broadcast(params), "doc_id", "inner")
    contrib = (
        "case when frame_id = 0 then frame_tokens "
        "else slice(frame_tokens, frame_len - hop + 1, hop) end"
    )
    return (
        joined.selectExpr("doc_id", "frame_id", f"{contrib} as contrib")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(frame_id, contrib))),"
                " s -> s.contrib))"
            ).alias("tokens")
        )
    )


def iterative_refine(
    token_df: DataFrame,
    frames: DataFrame,
    spec: FrameSpec = DEFAULT_FRAME,
    n_iter: int = 4,
) -> DataFrame:
    """Griffin-Lim analog (design.md:684-744: iterative signal refinement,
    n_iter fixed, driver-side loop over small constant iterations).

    Integer tokens make one pass exact, so the fixed-point is reached at
    iteration 1 — the loop demonstrates the project/reproject shape:
    reconstruct -> re-frame -> reconstruct ... Each iteration is a full
    Spark job; n_iter stays a small constant exactly as in the reference
    (32 iterations ≈ 32× one ISTFT, validation-design.md:120-123).
    """
    from audio_feature_extraction_spark.operators import framing

    current = reconstruct(frames, spec)
    for _ in range(max(n_iter - 1, 0)):
        ts = current.withColumn("n_tok", F.size("tokens").cast("int")).withColumn(
            "source", F.lit("refine")
        )
        current = reconstruct(framing.frame_table(ts, spec), spec)
    return current


def roundtrip_check(
    token_df: DataFrame, frames: DataFrame, spec: FrameSpec = DEFAULT_FRAME
) -> DataFrame:
    """(doc_id, ok) — exact equality of reconstructed vs original tokens.

    The original side ships only ``xxhash64(tokens)`` into the join
    (16 bytes/row instead of the whole array); the reconstructed side is
    hashed post-aggregation. Equality-by-hash: collision odds 2^-64 per
    doc — the unit tests additionally compare raw arrays.
    """
    rec = reconstruct(frames, spec).select(
        "doc_id", F.xxhash64("tokens").alias("_rec_h")
    )
    orig = token_df.select("doc_id", F.xxhash64("tokens").alias("_orig_h"))
    return (
        orig.join(rec, "doc_id", "left")
        .select("doc_id", (F.col("_orig_h") == F.col("_rec_h")).alias("ok"))
    )

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


def lossy_frame_targets(
    frames: DataFrame, bits: int = 3
) -> DataFrame:
    """Genuinely LOSSY per-frame features: the sorted multiset of
    low-bit-truncated token values per frame (``(t >> bits) << bits``).

    Dropping the low bits loses per-position detail and sorting loses
    position order — only overlap consistency across frames constrains a
    reconstruction, which is exactly the structure that makes real
    Griffin-Lim iterative (magnitude kept, phase lost; design.md:684-744
    analog). SQL-expressible: one narrow projection over the frame
    table."""
    return frames.select(
        "doc_id",
        "frame_id",
        F.expr(
            f"sort_array(transform(frame_tokens, "
            f"t -> cast((cast(t as bigint) div {1 << bits}) * {1 << bits} "
            f"as double)))"
        ).alias("target"),
    )


def lossy_refine(
    targets: DataFrame,
    spec: FrameSpec = DEFAULT_FRAME,
    bits: int = 3,
    n_iter: int = 8,
    momentum: float = 0.0,
    emit: str = "errors",
) -> DataFrame:
    """Griffin-Lim over the lossy token-feature space (VERDICT r03 #5):
    recover a signal consistent with every frame's quantized multiset by
    alternating projections, with MEASURED convergence.

    Per iteration (the two Griffin-Lim projections, reinterpreted):

    1. feature enforcement — each frame's values are replaced by the
       target multiset assigned in rank order (the minimal per-frame
       move onto the feature-consistent set; ≙ magnitude replacement);
    2. consistency — overlapping frames are overlap-add AVERAGED per
       position (≙ ISTFT∘STFT projection onto realizable signals).

    ``momentum`` adds the fast-GL extrapolation step
    (x ← y + m·(y − y_prev)). The error metric is the L1 distance
    between the estimate's quantized sorted frames and the targets,
    measured BEFORE each enforcement — it decreases monotonically to a
    nonzero fixed point (the quantization keeps the problem genuinely
    lossy; tested against an independent numpy oracle).

    Scale shape: signals are independent, so the whole n_iter loop runs
    inside one Arrow kernel per doc — one shuffle (groupBy doc_id),
    zero driver-side iteration, embarrassingly parallel. This is the
    right Spark shape for per-entity iterative algorithms (contrast
    ``connected_components``, whose iteration spans entities and must
    loop driver-side).

    ``emit='errors'`` -> (doc_id, iter, err) convergence table;
    ``emit='estimate'`` -> (doc_id, est array<double>) final signals.
    """
    import numpy as np
    import pandas as pd

    if emit not in ("errors", "estimate"):
        raise ValueError(f"emit must be errors|estimate, got {emit!r}")
    L, h = spec.frame_len, spec.hop
    step = 1 << bits

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("frame_id")
        doc = pdf["doc_id"].iloc[0]
        # the frame grid truncates tail frames, so targets are ragged —
        # per-frame numpy with a python loop over the (few) frames of
        # each doc; a uniform-grid doc could stack and fully vectorize
        tg = [np.asarray(t, dtype=np.float64) for t in pdf["target"]]
        starts = [i * h for i in range(len(tg))]
        n = starts[-1] + len(tg[-1])
        x = _overlap_average(tg, starts, n)  # init: targets as sorted
        y_prev = None
        errs = []
        for _ in range(n_iter):
            e = 0.0
            newframes = []
            for s, t in zip(starts, tg):
                fr = x[s : s + len(t)]
                q = np.sort(
                    (np.floor(fr).astype(np.int64) // step * step).astype(
                        np.float64
                    )
                )
                e += float(np.abs(q - t).sum())
                order = np.argsort(fr, kind="stable")
                nf = np.empty_like(fr)
                nf[order] = t
                newframes.append(nf)
            errs.append(e)
            y = _overlap_average(newframes, starts, n)
            if momentum and y_prev is not None:
                x = y + momentum * (y - y_prev)
            else:
                x = y
            y_prev = y
        if emit == "errors":
            return pd.DataFrame(
                {"doc_id": doc, "iter": np.arange(n_iter), "err": errs}
            )
        return pd.DataFrame({"doc_id": [doc], "est": [x]})

    schema = (
        "doc_id string, iter int, err double"
        if emit == "errors"
        else "doc_id string, est array<double>"
    )
    return targets.groupBy("doc_id").applyInPandas(run, schema=schema)


def _overlap_average(frames_list, starts, n):
    """Overlap-add average: positions covered by several frames take the
    mean of their contributions (the consistency projection)."""
    import numpy as np

    acc = np.zeros(n)
    cnt = np.zeros(n)
    for s, row in zip(starts, frames_list):
        acc[s : s + len(row)] += row
        cnt[s : s + len(row)] += 1
    return acc / np.maximum(cnt, 1)


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

"""Projected feature spaces + per-frame descriptors.

≙ mel filterbank projection (design.md:223-232, tasks.md:611-633), MFCC
DCT + deltas (requirements.md:35-36, tasks.md:637-657), and the scalar
descriptors chroma/ZCR/centroid (requirements.md:37-38, tasks.md:713-735).

Token reinterpretation:

* "mel filterbank"  -> fixed triangular bucket-merging matrix
  (n_buckets -> n_mels), constants baked as SQL literals so Spark and
  DuckDB evaluate the identical IEEE expression tree
* "MFCC"            -> DCT-II of the projected vector (cosine constants
  precomputed in Python — same literals both engines)
* "spectral centroid" -> count-weighted mean bucket index
* "ZCR"             -> adjacent-token change rate within the frame
* "rolloff"         -> smallest bucket with cumulative count >= 85%

All pure SQL over the frame/feature tables — narrow, no Python, no
shuffle beyond what framing already did.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.config import DEFAULT_FRAME, FrameSpec


def mel_matrix(n_buckets: int, n_mels: int) -> list[list[float]]:
    """Triangular overlapping filters over bucket indices (the classic
    mel-filterbank shape on a linear axis)."""
    centers = [ (m + 1) * (n_buckets - 1) / (n_mels + 1) for m in range(n_mels + 2) ]
    mat = []
    for m in range(n_mels):
        lo, c, hi = centers[m], centers[m + 1], centers[m + 2]
        row = []
        for b in range(n_buckets):
            if lo < b <= c:
                row.append((b - lo) / (c - lo))
            elif c < b < hi:
                row.append((hi - b) / (hi - c))
            else:
                row.append(0.0)
        mat.append(row)
    return mat


def dct_matrix(n: int) -> list[list[float]]:
    """DCT-II coefficients, computed once in Python (libm) and embedded
    as literals — identical in every engine."""
    return [
        [math.cos(math.pi * k * (2 * m + 1) / (2 * n)) for m in range(n)]
        for k in range(n)
    ]


def _matmul_expr(mat: list[list[float]], vec: str, spark: bool) -> str:
    """Literal-matrix × vector as a fixed expression tree (same fold order
    both engines: left-to-right addition per row)."""
    elem = (lambda i: f"element_at({vec}, {i + 1})") if spark else (
        lambda i: f"{vec}[{i + 1}]"
    )
    rows = []
    for row in mat:
        # E-notation forces DOUBLE literals in both engines (plain decimals
        # parse as DECIMAL in Spark and silently switch the arithmetic)
        terms = [
            f"({coef:.17e} * {elem(b)})" for b, coef in enumerate(row) if coef != 0.0
        ]
        rows.append("(" + " + ".join(terms) + ")" if terms else "cast(0.0 as double)")
    arr = "array" if spark else "list_value"
    return f"{arr}({', '.join(rows)})"


def mel_expr(
    spec: FrameSpec, n_mels: int, spark: bool, vec: str = "features"
) -> str:
    return _matmul_expr(mel_matrix(spec.n_buckets, n_mels), vec, spark)


def mfcc_expr(
    spec: FrameSpec, n_mels: int, spark: bool, vec: str = "features"
) -> str:
    """DCT-II of the mel projection (≙ MFCC; input already log-scaled by
    the framing dB step, matching log-mel -> DCT)."""
    mel = mel_expr(spec, n_mels, spark, vec)
    return _matmul_expr(dct_matrix(n_mels), f"({mel})", spark)


def project_mel(
    features: DataFrame, spec: FrameSpec = DEFAULT_FRAME, n_mels: int = 4
) -> DataFrame:
    return features.selectExpr(
        "doc_id", "frame_id", f"{mel_expr(spec, n_mels, True)} as mel"
    )


def mfcc(
    features: DataFrame, spec: FrameSpec = DEFAULT_FRAME, n_mels: int = 4
) -> DataFrame:
    return features.selectExpr(
        "doc_id", "frame_id", f"{mfcc_expr(spec, n_mels, True)} as mfcc"
    )


# ---------------------------------------------------------------------------
# per-frame scalar descriptors (over raw frame_tokens — integer-exact)
# ---------------------------------------------------------------------------

def descriptor_exprs(spec: FrameSpec, spark: bool, ft: str = "frame_tokens") -> dict[str, str]:
    nb, mult = spec.n_buckets, spec.bigram_mult
    if spark:
        counts = (
            f"transform(sequence(0, {nb - 1}), b -> bigint(size(filter("
            f"sequence(1, size({ft})), i -> i < size({ft}) and "
            f"(element_at({ft}, cast(i as int))*{mult} + element_at({ft}, cast(i+1 as int))) % {nb} = b))))"
        )
        total = f"aggregate({counts}, 0L, (a, x) -> a + x)"
        weighted = (
            f"aggregate(zip_with({counts}, sequence(0, {nb - 1}), (c, b) -> c * b), "
            f"0L, (a, x) -> a + x)"
        )
        changes = (
            f"size(filter(sequence(1, size({ft})), i -> i < size({ft}) and "
            f"element_at({ft}, cast(i as int)) != element_at({ft}, cast(i+1 as int))))"
        )
        nlen = f"size({ft})"
        # rolloff: min bucket with running sum >= ceil(0.85 * total)
        cum = (
            f"array_min(filter(transform(sequence(0, {nb - 1}), b -> "
            f"case when aggregate(slice({counts}, 1, b + 1), 0L, (a, x) -> a + x) * 100 >= 85 * {total} "
            f"then b else {nb} end), x -> x < {nb}))"
        )
    else:
        counts = (
            f"list_transform(range(0, {nb}), b -> CAST(len(list_filter("
            f"range(1, len({ft})), i -> ({ft}[i]*{mult} + {ft}[i+1]) % {nb} = b)) AS BIGINT))"
        )
        total = f"list_sum({counts})"
        weighted = (
            f"list_sum(list_transform(range(0, {nb}), b -> ({counts})[b + 1] * b))"
        )
        changes = (
            f"len(list_filter(range(1, len({ft})), i -> {ft}[i] != {ft}[i+1]))"
        )
        nlen = f"len({ft})"
        cum = (
            f"list_min(list_filter(list_transform(range(0, {nb}), b -> "
            f"CASE WHEN list_sum(({counts})[1 : b + 1]) * 100 >= 85 * {total} "
            f"THEN b ELSE {nb} END), x -> x < {nb}))"
        )
    return {
        "centroid": (
            f"CASE WHEN {total} > 0 THEN CAST({weighted} AS DOUBLE) / {total} "
            f"ELSE NULL END"
        ),
        "change_rate": (
            f"CASE WHEN {nlen} > 1 THEN CAST({changes} AS DOUBLE) / ({nlen} - 1) "
            f"ELSE 0.0 END"
        ),
        "rolloff": f"CAST({cum} AS INTEGER)",
    }


def frame_descriptors(frames: DataFrame, spec: FrameSpec = DEFAULT_FRAME) -> DataFrame:
    d = descriptor_exprs(spec, spark=True)
    return frames.selectExpr(
        "doc_id", "frame_id", *[f"{v} as {k}" for k, v in d.items()]
    )


def descriptors_oracle_sql(
    spec: FrameSpec = DEFAULT_FRAME, frames_from: str = "frames"
) -> str:
    d = descriptor_exprs(spec, spark=False)
    cols = ", ".join(f"{v} AS {k}" for k, v in d.items())
    return f"SELECT doc_id, frame_id, {cols} FROM {frames_from}"


def mel_oracle_sql(
    spec: FrameSpec, n_mels: int, features_from: str = "feats"
) -> str:
    return (
        f"SELECT doc_id, frame_id, {mel_expr(spec, n_mels, False)} AS mel "
        f"FROM {features_from}"
    )


def mfcc_oracle_sql(
    spec: FrameSpec, n_mels: int, features_from: str = "feats"
) -> str:
    return (
        f"SELECT doc_id, frame_id, {mfcc_expr(spec, n_mels, False)} AS mfcc "
        f"FROM {features_from}"
    )

"""Eager schema/shape validation (≙ dataclass __post_init__ checks,
design.md:117-149, 173-204; zero-length rejection
validation-design-v1.3.md:101-105).

The reference raises on construction; distributed analog: partition rows
into (valid, violations) and optionally fail the job if any violation
exists. Narrow map + one count — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ValidationError(ValueError):
    pass


def violation_expr(vocab: int = 32768) -> F.Column:
    """Null name of the first violated invariant, else null."""
    return (
        F.when(F.col("doc_id").isNull(), "null_doc_id")
        .when(F.col("tokens").isNull(), "null_tokens")
        .when(F.col("n_tok") != F.size("tokens"), "n_tok_mismatch")
        .when(F.col("n_tok") <= 0, "empty_sequence")
        .when(
            F.exists("tokens", lambda t: (t < 0) | (t >= vocab)),
            "token_out_of_range",
        )
        .otherwise(F.lit(None))
    )


def validate_token_sequences(
    df: DataFrame, vocab: int = 32768, strict: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Returns (valid, violations-with-reason). strict=True raises if any
    violation exists (the reference's eager-raise behavior)."""
    tagged = df.withColumn("violation", violation_expr(vocab))
    valid = tagged.where(F.col("violation").isNull()).drop("violation")
    bad = tagged.where(F.col("violation").isNotNull())
    if strict:
        n = bad.count()
        if n > 0:
            sample = [r.violation for r in bad.select("violation").limit(5).collect()]
            raise ValidationError(f"{n} invalid rows, e.g. {sample}")
    return valid, bad


def validation_counts(df: DataFrame, vocab: int = 32768) -> DataFrame:
    """Violation histogram (assertion-op form for the driver contract)."""
    return (
        df.withColumn("violation", violation_expr(vocab))
        .groupBy(F.coalesce("violation", F.lit("ok")).alias("check"))
        .agg(F.count("*").alias("n"))
    )

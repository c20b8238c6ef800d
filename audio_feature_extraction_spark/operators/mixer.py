"""SNR-controlled sequence mixing (≙ AudioMixer, design.md:928-1085).

Semantics carried over exactly:

* RMS of each side: ``sqrt(mean(x^2))`` (design.md:1045-1054) — computed
  here with exact integer sums, one division, one sqrt (cross-engine
  deterministic)
* gain: ``rms_clean / (rms_noise * 10^(snr_db/20))`` (design.md:974-976)
* noise length adjustment: repeat short noise cyclically / crop long
  noise to the clean length (design.md:1003-1043) — expressed as a
  modular index transform, no data-size-dependent Python
* mixed sequence: ``clean + gain * noise_adjusted`` elementwise
  (array<double>; the integer-token analog of waveform addition)
* batch pairing (design.md:1056-1085): deterministic hash pairing instead
  of live RNG (SURVEY §7.3) — clean doc i pairs with noise doc
  ``hash(i) % n_noise``.

Scale: the pairing is an equi-join; the noise side is aggregated stats +
arrays for the paired ids only. With a small noise corpus, broadcast; with
a skewed pairing, use operators/skew.salted_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rms_expr(col: str, spark: bool) -> str:
    """sqrt(mean(x^2)) with exact int64 accumulation."""
    if spark:
        s2 = f"aggregate({col}, 0L, (a, x) -> a + bigint(x)*x)"
        return f"sqrt(cast({s2} as double) / size({col}))"
    s2 = f"list_sum(list_transform({col}, x -> CAST(x AS BIGINT)*x))"
    return f"sqrt(CAST({s2} AS DOUBLE) / len({col}))"


def _adjust_noise_expr(clean_col: str, noise_col: str, spark: bool) -> str:
    """Cyclic repeat / crop noise to the clean length (design.md:1003-1043):
    adjusted[i] = noise[i mod len(noise)] for i in [0, len(clean))."""
    if spark:
        return (
            f"transform(sequence(0, size({clean_col}) - 1), "
            f"i -> element_at({noise_col}, cast(pmod(i, size({noise_col})) + 1 as int)))"
        )
    return (
        f"list_transform(range(0, len({clean_col})), "
        f"i -> {noise_col}[(i % len({noise_col})) + 1])"
    )


def mix_expr(clean_col: str, noise_col: str, snr_db: float, spark: bool) -> str:
    """mixed[i] = clean[i] + gain * noise_adj[i], gain per design.md:974-976."""
    adj = _adjust_noise_expr(clean_col, noise_col, spark)
    rms_c = rms_expr(clean_col, spark)
    rms_n = rms_expr(f"({adj})", spark)
    gain = f"({rms_c} / ({rms_n} * pow(10.0, {snr_db} / 20.0)))"
    if spark:
        return (
            f"zip_with({clean_col}, {adj}, (c, n) -> cast(c as double) + {gain} * n)"
        )
    return (
        f"list_transform(range(1, len({clean_col}) + 1), "
        f"i -> CAST({clean_col}[i] AS DOUBLE) + {gain} * ({adj})[i])"
    )


# affine pairing constants (deterministic pseudo-random, cross-engine)
PAIR_MULT = 7919
PAIR_OFF = 13


def pair_clean_noise(
    clean: DataFrame, noise: DataFrame, seq_col: str = "doc_id"
) -> DataFrame:
    """Deterministic clean×noise pairing (≙ batch_mix random pairing,
    design.md:1056-1085, made reproducible per SURVEY §7.3).

    Noise docs are indexed 0..n-1 by id order; clean doc with numeric id d
    pairs with index ``(d*7919 + 13) % n`` — pure affine arithmetic so the
    DuckDB oracle reproduces it exactly. Noise side is broadcast (small
    fixed noise bank, as in the reference).
    """
    n_idx = noise.select(
        F.col(seq_col).alias("noise_doc_id"), F.col("tokens").alias("noise_tokens")
    ).withColumn(
        "noise_idx", F.row_number().over(Window.orderBy("noise_doc_id")) - 1
    )
    n_count = n_idx.count()
    num = F.regexp_replace(F.col(seq_col), "[^0-9]", "").cast("bigint")
    paired = clean.withColumn(
        "noise_idx",
        F.pmod(num * PAIR_MULT + PAIR_OFF, F.lit(n_count)).cast("int"),
    )
    return paired.join(F.broadcast(n_idx), "noise_idx", "inner")


def mix_with_snr(
    paired: DataFrame,
    snr_db: float = 10.0,
    clean_col: str = "tokens",
    noise_col: str = "noise_tokens",
) -> DataFrame:
    """Add mixed sequence + per-row gain/rms columns (audit trail,
    ≙ metadata update design.md:984-993)."""
    rms_c = rms_expr(clean_col, spark=True)
    adj = _adjust_noise_expr(clean_col, noise_col, spark=True)
    rms_n = rms_expr(f"({adj})", spark=True)
    return (
        paired.withColumn("rms_clean", F.expr(rms_c))
        .withColumn("rms_noise", F.expr(rms_n))
        .withColumn(
            "gain", F.expr(f"{rms_c} / ({rms_n} * pow(10.0, {snr_db} / 20.0))")
        )
        .withColumn("mixed", F.expr(mix_expr(clean_col, noise_col, snr_db, spark=True)))
    )

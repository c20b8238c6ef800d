"""Fractional re-grid / resampling (S3, ≙ FR-1.3 requirements.md:20).

The reference's loader resamples audio onto a target sample rate at load
time. Token analog: re-grid a sequence from source rate ``q`` to target
rate ``p`` (any positive rationals) with LINEAR interpolation between the
two bracketing source positions — unlike ``augment.time_stretch_expr``,
which is nearest-index picking.

All arithmetic is exact integers (values are scaled by ``p`` and divided
once with round-half-up), so Spark SQL, DuckDB, and the numpy test oracle
agree bitwise. Narrow map — no shuffle, fully Catalyst-side.

Output grid: ``n_out = floor((n-1) * p / q) + 1`` output positions for a
non-empty input (the output spans exactly the source extent [0, n-1];
position i sits at source coordinate ``i * q / p``).
"""

from __future__ import annotations

from math import gcd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def regrid_expr(p: int, q: int, spark: bool, col: str = "tokens") -> str:
    """SQL expression resampling ``col`` from rate q to rate p.

    out[i] = round_half_up( t[lo]*(p-frac)/p + t[hi]*frac/p ) with
    lo = (i*q) div p, frac = (i*q) mod p, hi = min(lo+1, n-1).
    """
    if p <= 0 or q <= 0:
        raise ValueError(f"rates must be positive, got p={p}, q={q}")
    g = gcd(p, q)
    p, q = p // g, q // g
    if spark:
        n = f"size({col})"
        n_out = f"(({n} - 1) * {p}) div {q} + 1"
        lo = f"((i * {q}) div {p})"
        frac = f"((i * {q}) % {p})"
        t_lo = f"element_at({col}, cast({lo} as int) + 1)"
        t_hi = f"element_at({col}, cast(least({lo} + 1, {n} - 1) as int) + 1)"
        val = f"({t_lo} * ({p} - {frac}) + {t_hi} * {frac} + {p} div 2) div {p}"
        # sequence(0, -1) DESCENDS in Spark — the empty case must be guarded
        return (
            f"case when {n} = 0 then cast(array() as array<int>) "
            f"else transform(sequence(0, {n_out} - 1), i -> cast({val} as int)) end"
        )
    n = f"len({col})"
    n_out = f"(({n} - 1) * {p}) // {q} + 1"
    lo = f"((i * {q}) // {p})"
    frac = f"((i * {q}) % {p})"
    t_lo = f"{col}[{lo} + 1]"
    t_hi = f"{col}[least({lo} + 1, {n} - 1) + 1]"
    val = f"({t_lo} * ({p} - {frac}) + {t_hi} * {frac} + {p} // 2) // {p}"
    return (
        f"CASE WHEN {n} = 0 THEN CAST([] AS INTEGER[]) "
        f"ELSE list_transform(range(0, {n_out}), i -> CAST({val} AS INTEGER)) END"
    )


def regrid(
    df: DataFrame, sr_out: int, sr_in: int, col: str = "tokens"
) -> DataFrame:
    """Resample ``col`` from ``sr_in`` to ``sr_out`` (load-time contract:
    every sequence leaves on the same target grid)."""
    return df.withColumn(
        col, F.expr(regrid_expr(sr_out, sr_in, spark=True, col=col))
    ).withColumn("n_tok", F.size(col).cast("int"))

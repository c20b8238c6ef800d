"""Deterministic augmentation ops (FR-4: requirements.md:57-60;
tasks.md:662-684 pitch-shift / time-stretch / noise injection).

Token reinterpretations, all reproducible (hash-derived pseudo-randoms,
never live RNG — SURVEY §7.3 / design.md:1035's `randint` replaced):

* pitch-shift   -> affine vocabulary remap (order-preserving shift)
* time-stretch  -> sequence resampling by rational factor p/q
  (nearest-index pick, the integer analog of interpolation)
* noise inject  -> per-position deterministic token substitution at
  rate 1/r (position-hash selects sites, value-hash picks tokens)

All pure SQL (Spark + DuckDB dialects) — narrow maps, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pitch_shift_expr(shift: int, vocab: int, spark: bool, col: str = "tokens") -> str:
    """tokens -> (t + shift) mod vocab (order-preserving vocabulary remap)."""
    fn = "transform" if spark else "list_transform"
    if spark:
        return f"{fn}({col}, t -> cast(pmod(t + {shift}, {vocab}) as int))"
    return f"{fn}({col}, t -> CAST((((t + {shift}) % {vocab}) + {vocab}) % {vocab} AS INTEGER))"


def time_stretch_expr(p: int, q: int, spark: bool, col: str = "tokens") -> str:
    """Resample to length round(n*p/q): out[i] = tokens[floor(i*q/p)]
    (≙ time-stretch; nearest-index in the integer domain)."""
    if spark:
        n_out = f"cast((size({col}) * {p}) div {q} as int)"
        return (
            f"transform(sequence(0, {n_out} - 1), "
            f"i -> element_at({col}, cast((i * {q}) div {p} + 1 as int)))"
        )
    n_out = f"CAST((len({col}) * {p}) // {q} AS INTEGER)"
    return (
        f"list_transform(range(0, {n_out}), i -> {col}[(i * {q}) // {p} + 1])"
    )


def noise_inject_expr(
    rate_denom: int, vocab: int, spark: bool, col: str = "tokens", seed: int = 7
) -> str:
    """Replace position i's token when hash(i, t) % rate_denom == 0 with a
    deterministic pseudo-random token (≙ gaussian-noise augmentation made
    reproducible). Site + replacement derive from affine position/value
    hashes identical in both engines."""
    def site(i: str, t: str) -> str:
        # product form avoids residue degeneracies on arithmetic
        # sequences (an affine form mod small denom can miss 0 entirely)
        return f"(((({i} + 1) * ({t} + 13) + {seed}) % 1000003) % {rate_denom})"

    def repl(i: str, t: str) -> str:
        return f"(({t} * 48271 + {i} * 16807 + {seed}) % {vocab})"

    if spark:
        return (
            f"zip_with({col}, sequence(0, size({col}) - 1), (t, i) -> "
            f"cast(case when {site('i', 't')} = 0 then {repl('i', 't')} "
            f"else t end as int))"
        )
    t = f"{col}[i + 1]"
    return (
        f"list_transform(range(0, len({col})), i -> "
        f"CAST(CASE WHEN {site('i', t)} = 0 THEN {repl('i', t)} "
        f"ELSE {t} END AS INTEGER))"
    )


def augment(
    df: DataFrame,
    pitch_shift: int | None = None,
    stretch: tuple[int, int] | None = None,
    noise_denom: int | None = None,
    vocab: int = 32768,
) -> DataFrame:
    out = df
    if pitch_shift is not None:
        out = out.withColumn(
            "tokens", F.expr(pitch_shift_expr(pitch_shift, vocab, spark=True))
        )
    if stretch is not None:
        p, q = stretch
        out = out.withColumn("tokens", F.expr(time_stretch_expr(p, q, spark=True)))
    if noise_denom is not None:
        out = out.withColumn(
            "tokens", F.expr(noise_inject_expr(noise_denom, vocab, spark=True))
        )
    return out.withColumn("n_tok", F.size("tokens").cast("int"))

"""Cross-engine bit-reproducible transcendental arithmetic.

The JVM's ``Math.log`` family is NOT correctly rounded: fuzzing 100k
uniform inputs shows Spark's ``ln``/``log10``/``log2`` disagree with
libm (DuckDB, CPython) on 4–30% of values by 1 ulp (see
tests/test_retrieval.py::test_jvm_log_diverges_from_libm).  Any score
that feeds a driver value-hash — or any pipeline that must produce the
same bytes on heterogeneous clusters — therefore cannot call the
built-in logs on unbounded domains.  (The framing dB path solves this
with bounded lookup tables; retrieval idf has no bounded domain.)

This module instead DEFINES a logarithm out of operations that ARE
bit-stable everywhere (IEEE 754 +,-,*,/ are correctly rounded in both
engines, and decimal literals parse identically once cast to DOUBLE):

* exponent extraction integer-side: ``e = length(bin(a div b)) - 1``
  (the HyperLogLog rho precedent — ``bin`` exists in both dialects);
* mantissa reduction ``m = (a/b) / 2^e`` in [1, 2) with the power of
  two built by integer shift (exact);
* ``ln m = 2 atanh(z)``, ``z = (m-1)/(m+1)`` in [0, 1/3]: a fixed
  8-term odd series evaluated in pinned Horner order;
* ``ln(a/b) = e * ln2 + ln m``.

Truncation error vs the true log is < 1e-8 relative over the whole
domain (tested); cross-engine it is EXACT — the polynomial is the
specification.  Use this for any scoring formula that must hash-match
(BM25/TF-IDF idf in operators/retrieval.py).
"""

from __future__ import annotations

# 1/3, 1/5, ... 1/15 as shortest-repr doubles: the literal text parses
# to the same double in both engines; the series is then evaluated in
# pinned Horner order so every intermediate is identical.
_ATANH_COEFFS = [
    1.0,
    0.3333333333333333,
    0.2,
    0.14285714285714285,
    0.1111111111111111,
    0.09090909090909091,
    0.07692307692307693,
    0.06666666666666667,
]
_LN2 = 0.6931471805599453


def _d(x: float) -> str:
    return f"CAST({x!r} AS DOUBLE)"


def ln_ratio_sql(num: str, den: str, spark: bool) -> str:
    """SQL for the reproducible ``ln(num/den)`` over INTEGER-valued
    expressions ``num >= den >= 1`` (bigint-typed in the plan).

    The same arithmetic text evaluates on both engines; only the
    integer-division and shift spellings differ by dialect.
    """
    intdiv = f"({num}) div ({den})" if spark else f"({num}) // ({den})"
    e = f"(length(bin({intdiv})) - 1)"
    if spark:
        p2 = f"CAST(shiftleft(CAST(1 AS BIGINT), {e}) AS DOUBLE)"
    else:
        p2 = f"CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE)"
    m = f"((CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) / {p2})"
    z = f"(({m} - {_d(1.0)}) / ({m} + {_d(1.0)}))"
    # Horner in z2, innermost coefficient first; then * 2z; + e*ln2.
    horner = _d(_ATANH_COEFFS[-1])
    for c in reversed(_ATANH_COEFFS[:-1]):
        horner = f"({_d(c)} + _z2 * {horner})"
    # bind z and z2 once via a higher-order-function "let" (both
    # dialects: a 1-element list transform) to keep the generated
    # expression linear in the series length.
    if spark:
        return (
            f"element_at(transform(array({z}), _z -> "
            f"element_at(transform(array(_z * _z), _z2 -> "
            f"CAST({e} AS DOUBLE) * {_d(_LN2)} "
            f"+ ({_d(2.0)} * _z) * {horner}), 1)), 1)"
        )
    return (
        f"list_transform([{z}], _z -> "
        f"list_transform([_z * _z], _z2 -> "
        f"CAST({e} AS DOUBLE) * {_d(_LN2)} "
        f"+ ({_d(2.0)} * _z) * {horner})[1])[1]"
    )

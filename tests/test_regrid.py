"""Fractional re-grid (S3 / FR-1.3 analog): linear interpolation, exact
integer arithmetic, identity/extent properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import regrid as rg


def _mkdf(spark, seqs):
    rows = [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)]
    return spark.createDataFrame(rows, schema=TOKEN_SEQUENCES)


def _np_regrid(toks, p, q):
    from math import gcd

    g = gcd(p, q)
    p, q = p // g, q // g
    n = len(toks)
    if n == 0:
        return []
    out = []
    for i in range((n - 1) * p // q + 1):
        lo, frac = (i * q) // p, (i * q) % p
        hi = min(lo + 1, n - 1)
        out.append((toks[lo] * (p - frac) + toks[hi] * frac + p // 2) // p)
    return out


SEQS = [[0, 10], [0, 3, 6, 9], [5], [], list(range(0, 100, 7)), [32767, 0] * 9]


@pytest.mark.parametrize("p,q", [(2, 1), (1, 3), (3, 2), (2, 3), (7, 5), (4, 4)])
def test_regrid_matches_numpy(spark, p, q):
    df = _mkdf(spark, SEQS)
    got = {
        r.doc_id: list(r.tokens) for r in rg.regrid(df, p, q).collect()
    }
    for i, t in enumerate(SEQS):
        assert got[f"doc_{i}"] == _np_regrid(t, p, q), (i, p, q)


def test_regrid_identity(spark):
    df = _mkdf(spark, SEQS)
    got = {r.doc_id: list(r.tokens) for r in rg.regrid(df, 5, 5).collect()}
    for i, t in enumerate(SEQS):
        assert got[f"doc_{i}"] == t


def test_regrid_known_values(spark):
    # midpoint of [0, 10] at 2x: linear interp -> 5 (nearest-index would give 0)
    df = _mkdf(spark, [[0, 10]])
    (row,) = rg.regrid(df, 2, 1).collect()
    assert list(row.tokens) == [0, 5, 10]
    assert row.n_tok == 3


def test_regrid_rejects_bad_rates():
    with pytest.raises(ValueError):
        rg.regrid_expr(0, 3, spark=True)
    with pytest.raises(ValueError):
        rg.regrid_expr(2, -1, spark=False)

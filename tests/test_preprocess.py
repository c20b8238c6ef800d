"""Preprocess ops vs numpy's own pad semantics (design.md:861-910 maps the
modes to np.pad 'constant'/'reflect'/'edge')."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import preprocess


def _mkdf(spark, seqs):
    return spark.createDataFrame(
        [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )


SEQS = [
    [5, 1, 9, 3, 7],
    [2],
    [4, 4],
    list(range(30)),
]


@pytest.mark.parametrize("mode,np_mode", [("constant", "constant"), ("reflect", "reflect"), ("replicate", "edge")])
def test_pad_matches_numpy(spark, mode, np_mode):
    target = 12
    df = _mkdf(spark, SEQS)
    out = {
        r.doc_id: list(r.adj)
        for r in df.select(
            "doc_id",
            F.expr(preprocess.adjust_length_expr(target, mode, 0, spark=True)).alias("adj"),
        ).collect()
    }
    for i, s in enumerate(SEQS):
        if len(s) >= target:
            start = (len(s) - target) // 2
            exp = s[start : start + target]
        else:
            kw = {"constant_values": 0} if np_mode == "constant" else {}
            exp = np.pad(np.array(s), (0, target - len(s)), mode=np_mode, **kw).tolist()
        assert out[f"doc_{i}"] == exp, (mode, s)


def test_crop_center(spark):
    # design.md:906-908: start = (len - target)//2
    df = _mkdf(spark, [list(range(10))])
    out = df.select(
        F.expr(preprocess.adjust_length_expr(4, "constant", 0, spark=True)).alias("a")
    ).collect()[0].a
    assert list(out) == [3, 4, 5, 6]


def test_trim(spark):
    # keep [first >= thr, last >= thr] span (design.md:837-859)
    df = _mkdf(spark, [[0, 0, 5, 1, 7, 0, 0], [0, 0], [9]])
    out = {
        r.doc_id: list(r.t)
        for r in df.select(
            "doc_id", F.expr(preprocess.trim_expr(5, spark=True)).alias("t")
        ).collect()
    }
    assert out["doc_0"] == [5, 1, 7]
    assert out["doc_1"] == []          # all below threshold -> empty
    assert out["doc_2"] == [9]


def test_normalize(spark):
    df = _mkdf(spark, [[2, 4, 8], [0, 0]])
    out = {
        r.doc_id: list(r.n)
        for r in df.select(
            "doc_id", F.expr(preprocess.normalize_expr(spark=True)).alias("n")
        ).collect()
    }
    assert out["doc_0"] == [0.25, 0.5, 1.0]
    assert out["doc_1"] == [0.0, 0.0]  # zero-max guard (design.md:832-835)


def test_process_keeps_original_length(spark):
    df = _mkdf(spark, [[0, 9, 9, 0], [1, 2]])
    out = preprocess.process(df, trim_threshold=5, target_length=3).collect()
    by = {r.doc_id: r for r in out}
    assert by["doc_0"].original_length == 4
    assert list(by["doc_0"].tokens) == [9, 9, 0]  # trimmed to [9,9], padded
    assert by["doc_0"].n_tok == 3

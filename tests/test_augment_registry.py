"""Augmentation ops (FR-4), extractor registry, params-join inversion."""

from __future__ import annotations

import pytest

from audio_feature_extraction_spark.core.config import FrameSpec
from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.functions.registry import default_registry
from audio_feature_extraction_spark.operators import augment, framing, inverse

SPEC = FrameSpec(frame_len=16, hop=8)


def _mkdf(spark, seqs):
    return spark.createDataFrame(
        [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )


def test_pitch_shift_wraps(spark):
    df = _mkdf(spark, [[0, 100, 32767]])
    out = augment.augment(df, pitch_shift=10).collect()[0]
    assert list(out.tokens) == [10, 110, 9]  # 32767+10 wraps mod 32768


def test_time_stretch_lengths(spark):
    df = _mkdf(spark, [list(range(10))])
    longer = augment.augment(df, stretch=(3, 2)).collect()[0]
    assert longer.n_tok == 15
    assert list(longer.tokens) == [(i * 2) // 3 for i in range(15)]
    shorter = augment.augment(df, stretch=(1, 2)).collect()[0]
    assert shorter.n_tok == 5
    assert list(shorter.tokens) == [0, 2, 4, 6, 8]


def test_noise_inject_deterministic_and_sparse(spark):
    seq = list(range(1000, 1400))
    df = _mkdf(spark, [seq])
    a = list(augment.augment(df, noise_denom=10).collect()[0].tokens)
    b = list(augment.augment(df, noise_denom=10).collect()[0].tokens)
    assert a == b  # reproducible
    changed = sum(1 for x, y in zip(a, seq) if x != y)
    assert 0 < changed < len(seq) // 3  # ~1/10 substitution rate


def test_augmented_roundtrip_still_exact(spark):
    """Augment -> frame -> reconstruct must return the augmented sequence
    (the pipeline composes)."""
    df = augment.augment(_mkdf(spark, [list(range(40))]), pitch_shift=5)
    frames = framing.frame_table(df, SPEC)
    ok = inverse.roundtrip_check(df, frames, SPEC).collect()
    assert all(r.ok for r in ok)


def test_registry_roundtrip(spark):
    reg = default_registry()
    assert "frame_features" in reg.names()
    df = _mkdf(spark, [list(range(40))])
    for name in reg.names():
        assert reg.conforms(name, df, SPEC), name
    out = reg.get("mel", SPEC)(df)
    assert out.columns == ["doc_id", "frame_id", "mel"]
    with pytest.raises(KeyError):
        reg.get("nope")
    with pytest.raises(ValueError):
        reg.register("mel", lambda s: lambda d: d, ("doc_id",))


def test_reconstruct_with_params(spark):
    df = _mkdf(spark, [list(range(40)), list(range(100, 117))])
    frames = framing.frame_table(df, SPEC)
    params = spark.createDataFrame(
        [("doc_0", 16, 8), ("doc_1", 16, 8)], "doc_id string, frame_len int, hop int"
    )
    rec = {r.doc_id: list(r.tokens) for r in
           inverse.reconstruct_with_params(frames, params).collect()}
    assert rec["doc_0"] == list(range(40))
    assert rec["doc_1"] == list(range(100, 117))


def test_iterative_refine_fixed_point(spark):
    df = _mkdf(spark, [list(range(40))])
    frames = framing.frame_table(df, SPEC)
    out = {r.doc_id: list(r.tokens) for r in
           inverse.iterative_refine(df, frames, SPEC, n_iter=3).collect()}
    assert out["doc_0"] == list(range(40))

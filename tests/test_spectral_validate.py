"""Mel/MFCC projections, frame descriptors, validation, frame-grid adjust."""

from __future__ import annotations

import math

import pytest

from audio_feature_extraction_spark.core.config import FrameSpec
from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import framing, preprocess, spectral, validate

SPEC = FrameSpec(frame_len=16, hop=8)


def _mkdf(spark, seqs):
    return spark.createDataFrame(
        [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )


def test_mel_projection_matches_python(spark):
    seq = list(range(500, 540))
    df = _mkdf(spark, [seq])
    feats = framing.frame_features_sql(df, SPEC)
    got = {
        r.frame_id: list(r.mel)
        for r in spectral.project_mel(feats, SPEC, n_mels=4).collect()
    }
    mat = spectral.mel_matrix(SPEC.n_buckets, 4)
    for r in feats.collect():
        exp = [
            sum(c * f for c, f in zip(row, r.features) if c != 0.0) for row in mat
        ]
        assert got[r.frame_id] == pytest.approx(exp, rel=1e-12)


def test_mfcc_dct_orthogonality_shape(spark):
    df = _mkdf(spark, [list(range(100, 150))])
    feats = framing.frame_features_sql(df, SPEC)
    rows = spectral.mfcc(feats, SPEC, n_mels=4).collect()
    assert all(len(r.mfcc) == 4 for r in rows)
    # DCT matrix row 0 is all-ones: c0 == sum(mel)
    mel = {r.frame_id: r.mel for r in spectral.project_mel(feats, SPEC, 4).collect()}
    for r in rows:
        assert r.mfcc[0] == pytest.approx(sum(mel[r.frame_id]), rel=1e-12)


def test_descriptors(spark):
    df = _mkdf(spark, [[5, 5, 5, 5], [1, 2, 1, 2]])
    frames = framing.frame_table(df, SPEC)
    d = {r.doc_id: r for r in spectral.frame_descriptors(frames, SPEC).collect()}
    assert d["doc_0"].change_rate == 0.0          # constant frame
    assert d["doc_1"].change_rate == 1.0          # alternating
    assert d["doc_0"].rolloff is not None
    # centroid: all bigrams of [5,5,5,5] hash to one bucket b -> centroid b
    b = (5 * SPEC.bigram_mult + 5) % SPEC.n_buckets
    assert d["doc_0"].centroid == float(b)


def test_validation(spark):
    rows = [
        ("ok", [1, 2, 3], 3, "web"),
        ("bad_len", [1, 2], 5, "web"),
        ("empty", [], 0, "web"),
        ("range", [1, 99999], 2, "web"),
    ]
    df = spark.createDataFrame(rows, schema=TOKEN_SEQUENCES)
    valid, bad = validate.validate_token_sequences(df)
    assert [r.doc_id for r in valid.collect()] == ["ok"]
    reasons = {r.doc_id: r.violation for r in bad.collect()}
    assert reasons == {
        "bad_len": "n_tok_mismatch",
        "empty": "empty_sequence",
        "range": "token_out_of_range",
    }
    with pytest.raises(validate.ValidationError):
        validate.validate_token_sequences(df, strict=True)


def test_adjust_frames_pad_and_crop(spark):
    # doc_0: 9 frames (len 68); doc_1: 3 frames (len 17)
    df = _mkdf(spark, [list(range(68)), list(range(17))])
    feats = framing.frame_features_sql(df, SPEC)
    out = preprocess.adjust_frames(feats, target_frames=5, spec_n_buckets=SPEC.n_buckets)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    # cropped doc: exactly 5 frames, ids 0..4, center crop start=(9-5)//2=2
    f0 = sorted(by_doc["doc_0"], key=lambda r: r.frame_id)
    assert [r.frame_id for r in f0] == [0, 1, 2, 3, 4]
    assert all(r.stats is not None for r in f0)
    # padded doc: 5 frames, last 2 synthetic at -80 dB with null stats
    f1 = sorted(by_doc["doc_1"], key=lambda r: r.frame_id)
    assert [r.frame_id for r in f1] == [0, 1, 2, 3, 4]
    assert f1[2].stats is not None  # real frame
    assert f1[3].stats is None and f1[4].stats is None
    assert all(v == -80.0 for v in f1[4].features)


def test_adjust_frames_center_crop_content(spark):
    df = _mkdf(spark, [list(range(68))])
    feats = framing.frame_features_sql(df, SPEC)
    orig = {r.frame_id: list(r.frame_tokens) for r in feats.collect()}
    out = preprocess.adjust_frames(feats, 5, SPEC.n_buckets)
    got = {r.frame_id: list(r.frame_tokens) for r in out.collect()}
    for new_id in range(5):
        assert got[new_id] == orig[new_id + 2]

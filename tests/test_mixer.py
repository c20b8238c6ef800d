"""Mixer: target-SNR accuracy (tasks.md:391 ±1 dB — exact here by
construction) + noise length alignment (design.md:1003-1043)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import mixer


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, schema=TOKEN_SEQUENCES)


@pytest.mark.parametrize("snr_db", [0.0, 10.0, -5.0])
def test_measured_snr_hits_target(spark, snr_db):
    clean = _mkdf(spark, [("doc_0", [100, 200, 150, 180] * 8, 32, "clean")])
    noise = _mkdf(spark, [("doc_1", [30, 60, 20] * 4, 12, "noise")])
    paired = mixer.pair_clean_noise(clean, noise)
    out = mixer.mix_with_snr(paired, snr_db=snr_db).collect()[0]
    # measured SNR = 20*log10(rms_clean / (gain * rms_noise)) == target
    measured = 20.0 * math.log10(out.rms_clean / (out.gain * out.rms_noise))
    assert abs(measured - snr_db) < 1e-9  # spec tolerance is ±1 dB
    assert len(out.mixed) == 32


@pytest.mark.parametrize(
    "noise_len,clean_len", [(4, 12), (12, 12), (20, 12)]
)
def test_noise_length_adjust(spark, noise_len, clean_len):
    clean_toks = list(range(1, clean_len + 1))
    noise_toks = list(range(101, 101 + noise_len))
    df = spark.createDataFrame(
        [(clean_toks, noise_toks)], "tokens array<int>, noise_tokens array<int>"
    )
    adj = df.select(
        F.expr(mixer._adjust_noise_expr("tokens", "noise_tokens", spark=True)).alias("a")
    ).collect()[0].a
    exp = [noise_toks[i % noise_len] for i in range(clean_len)]
    assert list(adj) == exp


def test_pairing_deterministic(spark):
    clean = _mkdf(
        spark, [(f"doc_{i}", [1, 2, 3, 4], 4, "clean") for i in range(0, 10, 2)]
    )
    noise = _mkdf(
        spark, [(f"doc_{i}", [9, 9], 2, "noise") for i in range(1, 10, 2)]
    )
    a = sorted(
        (r.doc_id, r.noise_doc_id)
        for r in mixer.pair_clean_noise(clean, noise).collect()
    )
    b = sorted(
        (r.doc_id, r.noise_doc_id)
        for r in mixer.pair_clean_noise(clean, noise).collect()
    )
    assert a == b
    assert len(a) == 5


def test_rms(spark):
    df = _mkdf(spark, [("doc_0", [3, 4], 2, "web")])
    rms = df.select(F.expr(mixer.rms_expr("tokens", spark=True)).alias("r")).collect()[0].r
    assert rms == math.sqrt((9 + 16) / 2)

"""MPEG-1 Layer I/II sample codec (VERDICT r04 #1): bit-tolerant
round-trip tests against deterministic fixtures encoded with the same
tables/windows (the self-consistency contract mpeg_decode documents),
filterbank quality gates, bitstream-path coverage (grouping, scfsi,
stereo), and the probe->decode integration through _decode_real."""

from __future__ import annotations

import numpy as np
import pytest

from audio_feature_extraction_spark.multimodal import mpeg_decode as M
from audio_feature_extraction_spark.multimodal.mpeg import Mp3Error, parse_mp3

SR = 32000
N = 1152 * 6


def _sine(n=N, sr=SR):
    t = np.arange(n)
    return 0.6 * np.sin(2 * np.pi * 440 * t / sr) + 0.2 * np.sin(
        2 * np.pi * 1333 * t / sr
    )


def _snr(ref_full, decoded, d=M.FILTERBANK_DELAY):
    ref = ref_full[: len(decoded) - d][600:-600]
    seg = decoded[d:][600 : 600 + len(ref)]
    n = min(len(ref), len(seg))
    ref, seg = ref[:n], seg[:n]
    err = seg - ref
    return 10 * np.log10((ref**2).sum() / (err**2).sum())


def test_filterbank_near_perfect_reconstruction():
    """analysis -> synthesis with the designed window pair reconstructs
    at > 55 dB with the documented 481-sample delay (the floor every
    codec SNR below sits on)."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(4096)
    y = M.synthesize_blocks(M.analyze_blocks(x))
    assert _snr(x, y) > 55.0


@pytest.mark.parametrize(
    "layer,nbits,floor", [(1, 8, 40.0), (1, 12, 55.0), (2, 8, 40.0), (2, 10, 50.0)]
)
def test_roundtrip_snr_quantizer_limited(layer, nbits, floor):
    x = _sine()
    blob = M.encode_mpeg(x, sr=SR, layer=layer, nbits=nbits)
    y, sr = M.decode_mpeg_samples(blob)
    assert sr == SR and len(y) == (len(x) // (384 if layer == 1 else 1152)) * (
        384 if layer == 1 else 1152
    )
    assert _snr(x, y) > floor
    # the container walk agrees with the codec's frame accounting
    info = parse_mp3(blob)
    assert info.layer == layer and info.sample_rate == SR
    assert info.n_frames == len(x) // (384 if layer == 1 else 1152)


def test_layer2_snr_scales_with_allocation():
    """More bits -> strictly better reconstruction: the codec is
    quantizer-limited, not filterbank- or bitstream-limited."""
    x = _sine()
    snrs = []
    for nbits in (4, 6, 8, 10):
        blob = M.encode_mpeg(x, sr=SR, layer=2, nbits=nbits)
        y, _sr = M.decode_mpeg_samples(blob)
        snrs.append(_snr(x, y))
    assert all(b > a + 5 for a, b in zip(snrs, snrs[1:])), snrs
    assert snrs[0] > 18.0


def test_noise_roundtrip_both_layers():
    rng = np.random.default_rng(3)
    xn = np.clip(rng.standard_normal(N) * 0.3, -1.9, 1.9)
    for layer, nbits, floor in ((1, 10, 45.0), (2, 10, 45.0)):
        blob = M.encode_mpeg(xn, sr=SR, layer=layer, nbits=nbits)
        y, _sr = M.decode_mpeg_samples(blob)
        assert _snr(xn, y) > floor


def test_stereo_channels_decode_independently():
    x = _sine()
    xs = np.stack([x, np.roll(x, 100)], axis=1)
    blob = M.encode_mpeg(xs, sr=SR, layer=2, nbits=5)
    y, sr = M.decode_mpeg_samples(blob)
    assert y.shape == (N, 2) and sr == SR
    for ch in range(2):
        assert _snr(xs[:, ch], y[:, ch]) > 25.0
    # channels are genuinely distinct (not a mixdown)
    assert np.abs(y[:, 0] - y[:, 1]).max() > 0.1


def test_layer2_grouped_codes_path():
    """nbits=2 forces 3-level quantizers -> the 3-samples-in-one-code
    grouped path on encode AND decode; reconstruction stays within the
    coarse quantizer's bound instead of collapsing."""
    x = _sine()
    blob = M.encode_mpeg(x, sr=SR, layer=2, nbits=2)
    y, _sr = M.decode_mpeg_samples(blob)
    assert _snr(x, y) > 4.0  # 3-level quantizer: coarse but coherent


def test_layer2_frame_bits_roundtrip_exact():
    """Frame-level bitstream round trip in the SUBBAND domain: decode
    recovers exactly what the quantizer could represent — per-sample
    error <= sf/(levels-1) for every subband and scalefactor part,
    across grouped and ungrouped rows and all scfsi patterns used."""
    rng = np.random.default_rng(5)
    sub = rng.uniform(-1.5, 1.5, size=(36, 32, 1))
    alloc = np.zeros((1, M.L2_SBLIMIT), dtype=np.int64)
    for sb in range(M.L2_SBLIMIT):
        _bits, row = M.l2_alloc_row(sb)
        alloc[0, sb] = (sb % len(row)) + 1  # sweep every row entry
    bw = M.BitWriter()
    M._encode_layer2_frame(bw, sub, alloc)
    back = M._decode_layer2_frame(M.BitReader(bw.tobytes()), 1)
    for sb in range(M.L2_SBLIMIT):
        _bits, row = M.l2_alloc_row(sb)
        levels = row[alloc[0, sb] - 1]
        for part in range(3):
            seg = sub[12 * part : 12 * (part + 1), sb, 0]
            got = back[12 * part : 12 * (part + 1), sb, 0]
            sf = M.SCALEFACTORS[M._pick_scalefactor(float(np.abs(seg).max()))]
            bound = sf / (levels - 1) + 1e-9
            assert np.abs(got - seg).max() <= bound


def test_scfsi_shared_scalefactor_path():
    """A steady-amplitude signal makes all three scalefactor parts
    agree -> the encoder emits scfsi=2 (one shared scalefactor) and the
    decoder's shared-sf path reproduces the normal-path quality."""
    t = np.arange(N)
    x = 0.5 * np.sin(2 * np.pi * 500 * t / SR)
    blob = M.encode_mpeg(x, sr=SR, layer=2, nbits=8)
    y, _sr = M.decode_mpeg_samples(blob)
    assert _snr(x, y) > 40.0
    # steady signal + shared scalefactors -> strictly fewer payload
    # bits than a 3-sf encode of a sweeping signal would need, and the
    # stream still parses frame-exactly
    assert parse_mp3(blob).n_frames == N // 1152


def test_layer3_dispatch_and_joint_stereo_seam():
    """Layer III now dispatches to the real mpeg_layer3 path (a Layer II
    payload relabeled as Layer III is garbage THERE, not an
    unimplemented seam); joint stereo on Layer II remains a refusal."""
    x = _sine(1152 * 2)
    blob = bytearray(M.encode_mpeg(x, sr=SR, layer=2, nbits=6))
    # rewrite the header's layer bits (17-18) from II (0b10) to III (0b01)
    h = int.from_bytes(blob[:4], "big")
    h = (h & ~(0x3 << 17)) | (0x1 << 17)
    blob[:4] = h.to_bytes(4, "big")
    with pytest.raises(Mp3Error):
        M.decode_mpeg_samples(bytes(blob))
    # joint stereo: mode bits 6-7 -> 01
    blob = bytearray(M.encode_mpeg(x, sr=SR, layer=2, nbits=6))
    h = int.from_bytes(blob[:4], "big")
    h = (h & ~(0x3 << 6)) | (0x1 << 6)
    blob[:4] = h.to_bytes(4, "big")
    with pytest.raises(Mp3Error, match="joint"):
        M.decode_mpeg_samples(bytes(blob))


def test_decode_real_seam_decodes_mpeg_audio():
    """_decode_real (the production mapInPandas decode seam) decodes
    MPEG Layer I/II payloads for real — including with a leading ID3v2
    tag — and routes OggS payloads to the Vorbis codec (garbage Ogg is
    a parse error, not an unimplemented seam)."""
    from audio_feature_extraction_spark.multimodal.binary import _decode_real
    from audio_feature_extraction_spark.multimodal.ogg import OggError
    from audio_feature_extraction_spark.multimodal.vorbis import encode_vorbis

    x = _sine(1152 * 2)
    blob = M.encode_mpeg(x, sr=SR, layer=2, nbits=8)
    out = _decode_real(blob, "audio")
    assert isinstance(out, np.ndarray) and len(out) == 1152 * 2
    assert _snr(x, out) > 40.0
    # ID3v2-prefixed payload routes through the same decode
    size = 64
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
         size & 0x7F]
    ) + bytes(size)
    out2 = _decode_real(id3 + blob, "audio")
    assert np.allclose(out, out2)
    # a real engine-profile Ogg Vorbis payload decodes for real
    ogg = encode_vorbis(_sine(128 * 20), sr=SR)
    vout = _decode_real(ogg, "audio")
    assert isinstance(vout, np.ndarray) and len(vout) > 128 * 10
    # truncated/garbage Ogg raises a parse error, not NotImplementedError
    with pytest.raises(OggError):
        _decode_real(b"OggS" + bytes(64), "audio")


def test_extract_media_features_real_decode_mpeg(spark):
    """Spark integration: the Arrow-batched feature extractor with
    decode_stub=False runs the real MPEG decode inside the executor
    kernel; a Layer III payload degrades to a per-row error under
    on_error='skip' instead of killing the job."""
    from audio_feature_extraction_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    from audio_feature_extraction_spark.multimodal.mpeg_layer3 import (
        encode_layer3,
    )

    x = _sine(1152 * 2)
    good = M.encode_mpeg(x, sr=SR, layer=2, nbits=8)
    good_l3 = encode_layer3(x, sr=SR)
    bad = bytearray(good)  # Layer II payload relabeled as Layer III:
    h = int.from_bytes(bad[:4], "big")  # garbage to the real L3 path
    h = (h & ~(0x3 << 17)) | (0x1 << 17)
    bad[:4] = h.to_bytes(4, "big")
    meta = {"width": None, "height": None, "sample_rate": SR,
            "n_frames": 2, "codec": "mp2"}
    media = spark.createDataFrame(
        [("m_good", "audio", bytes(good), meta),
         ("m_good_l3", "audio", bytes(good_l3), meta),
         ("m_bad", "audio", bytes(bad), meta)],
        schema=MEDIA_SCHEMA,
    )
    out = {
        r.media_id: r
        for r in extract_media_features(
            media, dim=8, decode_stub=False, on_error="skip"
        ).collect()
    }
    assert out["m_good"].error is None
    assert len(out["m_good"].features) == 8
    assert max(out["m_good"].features) > 0.0
    # Layer III decodes FOR REAL through the same executor kernel now
    assert out["m_good_l3"].error is None
    assert len(out["m_good_l3"].features) == 8
    assert max(out["m_good_l3"].features) > 0.0
    # the relabeled stream is garbage to the Layer III parser: a
    # per-row error under skip, never a job failure
    assert out["m_bad"].features is None
    assert "Mp3Error" in out["m_bad"].error

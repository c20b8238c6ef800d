"""MPEG-1 Layer III codec: transform identities, bitstream round
trips, rate-loop invariants, end-to-end SNR, and the documented seams.

Self-consistency contract (same as the Layer I/II codec): streams from
``encode_layer3`` decode bit-structurally through ``decode_layer3_
samples`` / ``decode_mpeg_samples`` at quantizer- or rate-limited SNR.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from audio_feature_extraction_spark.multimodal import mpeg_layer3 as L3
from audio_feature_extraction_spark.multimodal.mpeg import Mp3Error, parse_mp3
from audio_feature_extraction_spark.multimodal.mpeg_decode import (
    BitReader,
    BitWriter,
    decode_mpeg_samples,
)

# analysis->synthesis polyphase (481) + one MDCT granule (576)
DELAY = 1057


def _snr(ref: np.ndarray, out: np.ndarray) -> float:
    m = min(len(ref), len(out) - DELAY) - 1152  # drop unflushed tail
    a, b = ref[:m], out[DELAY : DELAY + m]
    return 10 * math.log10(float((a * a).sum() / ((a - b) ** 2).sum()))


# ---------------------------------------------------------------------------
# transform identities
# ---------------------------------------------------------------------------


def test_mdct_imdct_tdac():
    """Perfect reconstruction through the 18/36 MDCT with sine window
    and 50% overlap-add — granule g reconstructs encoder granule g-1."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, L3.BLK))
    carry = np.zeros(L3.BLK)
    specs = []
    for g in range(8):
        specs.append(L3.mdct_block(np.concatenate([carry, x[g]])))
        carry = x[g]
    rec_carry = np.zeros(L3.BLK)
    outs = []
    for g in range(8):
        y = L3.imdct_block(specs[g])
        outs.append(y[: L3.BLK] + rec_carry)
        rec_carry = y[L3.BLK :]
    assert np.abs(np.array(outs)[1:] - x[:-1]).max() < 1e-12


def test_alias_butterflies_are_rotations():
    rng = np.random.default_rng(2)
    v = rng.standard_normal(L3.LINES)
    fwd = L3.alias_reduce(v)
    assert np.abs(L3.alias_reduce(v, inverse=True) - v).max() > 0  # acts
    assert np.abs(L3.alias_reduce(L3.alias_reduce(v, inverse=True)) - v).max() < 1e-12
    # energy preserved (orthogonal)
    assert abs((fwd * fwd).sum() - (v * v).sum()) < 1e-9


def test_freq_inversion_is_involution():
    rng = np.random.default_rng(3)
    b = rng.standard_normal((L3.BLK, L3.SUBBANDS))
    assert np.array_equal(L3._freq_inversion(L3._freq_inversion(b)), b)
    assert b[1, 1] == -L3._freq_inversion(b)[1, 1]


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def test_huffman_kraft_complete_and_roundtrip():
    for table in (L3.PAIR_TABLE, L3.COUNT1_TABLE):
        kraft = sum(2.0 ** -n for _, n in table.codes)
        assert abs(kraft - 1.0) < 1e-12  # complete prefix code
        rng = random.Random(7)
        syms = [rng.randrange(len(table.codes)) for _ in range(400)]
        bw = BitWriter()
        for s in syms:
            table.write(bw, s)
        br = BitReader(bw.tobytes())
        assert [table.read(br) for _ in syms] == syms


def test_huffman_tables_favor_small_values():
    """The deterministic weights give (0,0) the shortest pair code and
    (15,15) among the longest — the shape that makes sparse spectra
    cheap."""
    ln = {s: n for s, (_, n) in enumerate(L3.PAIR_TABLE.codes)}
    assert ln[0] == min(ln.values())
    assert ln[255] == max(ln.values())


# ---------------------------------------------------------------------------
# side info + granule bitstream
# ---------------------------------------------------------------------------


def test_side_info_roundtrip_random_fields():
    rng = random.Random(20260817)
    for nch in (1, 2):
        si = L3.SideInfo()
        si.main_data_begin = rng.randrange(512)
        si.scfsi = [[rng.randrange(2) for _ in range(4)] for _ in range(nch)]
        si.granules = []
        for _ in range(2):
            chs = []
            for _ in range(nch):
                g = L3.GranuleInfo(
                    part2_3_length=rng.randrange(4096),
                    big_values=rng.randrange(289),
                    global_gain=rng.randrange(256),
                    scalefac_compress=rng.randrange(16),
                    table_select=(rng.randrange(5), rng.randrange(5), rng.randrange(5)),
                    region0_count=rng.randrange(16),
                    region1_count=rng.randrange(8),
                    preflag=rng.randrange(2),
                    scalefac_scale=rng.randrange(2),
                    count1table_select=rng.randrange(2),
                )
                chs.append(g)
            si.granules.append(chs)
        bw = BitWriter()
        L3.write_side_info(bw, si, nch)
        data = bw.tobytes(pad_to=L3.side_info_bytes(nch))
        assert len(data) == (17 if nch == 1 else 32)
        si2 = L3.parse_side_info(BitReader(data), nch)
        assert si2.main_data_begin == si.main_data_begin
        assert si2.scfsi == si.scfsi
        for gr in range(2):
            for ch in range(nch):
                assert si2.granules[gr][ch] == si.granules[gr][ch]


def test_side_info_rejects_field_overflow():
    si = L3.SideInfo()
    si.scfsi = [[0, 0, 0, 0]]
    g = L3.GranuleInfo(part2_3_length=4096)
    si.granules = [[g], [L3.GranuleInfo()]]
    with pytest.raises(Mp3Error, match="12-bit"):
        L3.write_side_info(BitWriter(), si, 1)


def test_granule_spectrum_bit_exact_roundtrip():
    """encode granule -> decode granule reproduces the exact integer
    codes, across sparse and dense spectra and all engine tables."""
    rng = np.random.default_rng(5)
    cases = [
        rng.standard_normal(576) * 0.02,                      # dense small
        np.where(rng.random(576) < 0.05, rng.standard_normal(576), 0.0),
        np.zeros(576),                                        # silent
    ]
    big = np.zeros(576)
    big[:20] = rng.standard_normal(20) * 50                   # ESC/linbits
    cases.append(big)
    for xr in cases:
        g, sf, x = L3._encode_granule(xr, max_code=6000)
        bw = BitWriter()
        p2 = L3._write_scalefacs(bw, g, sf)
        g.part2_3_length = p2 + L3._write_spectrum(bw, g, x)
        assert g.part2_3_length <= L3.MAX_GRANULE_BITS
        br = BitReader(bw.tobytes())
        sf2, p2b = L3._read_scalefacs(br, g, [0] * 4, None)
        x2 = L3._read_spectrum(br, g, p2b)
        assert np.array_equal(x, x2)


def test_rate_loop_fits_the_budget():
    """Dense spectra that would blow the 12-bit part2_3_length field
    must coarsen (the ISO inner loop) instead of overflowing."""
    rng = np.random.default_rng(6)
    xr = rng.standard_normal(576)  # dense: naive encode needs ~5k bits
    for budget in (4095, 2500, 1200):
        g, sf, x = L3._encode_granule(xr, max_code=4000, max_bits=budget)
        bw = BitWriter()
        p2 = L3._write_scalefacs(bw, g, sf)
        hb = L3._write_spectrum(bw, g, x)
        assert p2 + hb <= budget


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------


def _sine(n, sr=32000, f=440.0, amp=0.5):
    return amp * np.sin(2 * np.pi * f * np.arange(n) / sr)


def test_roundtrip_mono_quantizer_limited():
    x = _sine(1152 * 6) + _sine(1152 * 6, f=1320.0, amp=0.2)
    blob = L3.encode_layer3(x, sr=32000, max_code=255)
    y, sr = L3.decode_layer3_samples(blob, 0, len(blob))
    assert sr == 32000 and y.ndim == 1
    assert _snr(x, y) > 35.0


def test_snr_scales_with_max_code():
    x = _sine(1152 * 4)
    snrs = [
        _snr(x, L3.decode_layer3_samples(b, 0, len(b))[0])
        for b in (
            L3.encode_layer3(x, sr=32000, max_code=mc)
            for mc in (15, 255, 4000)
        )
    ]
    assert snrs[0] < snrs[1] < snrs[2]
    # ~52 dB: the designed filterbank's ~60 dB reconstruction floor
    # composed with rate-loop coarsening — quantizer-limited below it
    assert snrs[2] > 50.0


def test_stereo_lr_and_ms_decode():
    n = 1152 * 4
    pcm = np.stack(
        [_sine(n, sr=44100), _sine(n, sr=44100, f=880.0, amp=0.3)], axis=1
    )
    for ms in (False, True):
        blob = L3.encode_layer3(pcm, sr=44100, max_code=255, ms_stereo=ms)
        y, sr = L3.decode_layer3_samples(blob, 0, len(blob))
        assert sr == 44100 and y.shape[1] == 2
        m = min(n, len(y) - DELAY) - 1152
        for ch in range(2):
            a, b = pcm[:m, ch], y[DELAY : DELAY + m, ch]
            corr = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
            assert corr > 0.97, (ms, ch, corr)
        info = parse_mp3(blob)
        assert info.layer == 3 and info.n_frames == n // 1152
        assert info.channel_mode == ("joint_stereo" if ms else "stereo")


def test_ms_matches_lr_for_correlated_signal():
    """A mono-ish signal (L == R) has zero side channel: MS encodes it
    losslessly relative to LR at the same budget or better."""
    n = 1152 * 3
    mono = _sine(n)
    pcm = np.stack([mono, mono], axis=1)
    b_lr = L3.encode_layer3(pcm, sr=32000, max_code=255, ms_stereo=False)
    b_ms = L3.encode_layer3(pcm, sr=32000, max_code=255, ms_stereo=True)
    y_lr, _ = L3.decode_layer3_samples(b_lr, 0, len(b_lr))
    y_ms, _ = L3.decode_layer3_samples(b_ms, 0, len(b_ms))
    assert _snr(mono, y_ms[:, 0]) >= _snr(mono, y_lr[:, 0]) - 1.0


def test_dispatch_through_decode_mpeg_samples():
    x = _sine(1152 * 3)
    blob = L3.encode_layer3(x, sr=48000)
    y, sr = decode_mpeg_samples(blob)
    assert sr == 48000
    assert _snr(x, y) > 35.0
    # the container walk agrees on geometry
    info = parse_mp3(blob)
    assert info.layer == 3 and info.n_frames == 3
    assert info.sample_rate == 48000


def test_stream_survives_leading_garbage():
    x = _sine(1152 * 2)
    blob = b"\x00junk\xff\x00" + L3.encode_layer3(x, sr=32000)
    y, sr = decode_mpeg_samples(blob)
    assert sr == 32000 and len(y) == 1152 * 2


def test_start_stop_window_seam_is_explicit():
    """Short blocks decode now; the remaining window seam is the
    start/stop TRANSITION types (block_type 1/3) — selecting one
    raises the documented error before any spectrum read."""
    x = _sine(1152)
    blob = bytearray(L3.encode_layer3(x, sr=32000))
    # side info starts at byte 4 (mono, unprotected); flip the
    # window_switching flag of granule 0 ch 0 and set block_type 1:
    # fields before it: 9 (mdb) + 5 (priv) + 4 (scfsi) + 12 + 9 + 8 + 4
    # = 51 bits -> ws flag is bit 51, block_type bits 52-53
    bit = 4 * 8 + 51
    blob[bit // 8] |= 0x80 >> (bit % 8)          # window_switching = 1
    bit += 2
    blob[bit // 8] |= 0x80 >> (bit % 8)          # block_type = 01 (start)
    with pytest.raises(Mp3Error, match="start/stop"):
        L3.decode_layer3_samples(bytes(blob), 0, len(blob))


def test_short_blocks_roundtrip():
    """block_type-2 short windows end to end: 3 x 12-point MDCTs with
    reordered transmission, per-window scalefactor machinery, no alias
    reduction — quantizer-limited SNR like the long path."""
    x = _sine(1152 * 4) + _sine(1152 * 4, f=2000.0, amp=0.2)
    blob = L3.encode_layer3(x, sr=32000, max_code=255, short_blocks=True)
    y, sr = L3.decode_layer3_samples(blob, 0, len(blob))
    assert sr == 32000
    assert _snr(x, y) > 35.0
    # the stream really is short-block: check the side info
    si = L3.parse_side_info(BitReader(bytes(blob), 4 * 8), 1)
    g = si.granules[0][0]
    assert g.window_switching == 1 and g.block_type == 2


def test_short_block_stereo_ms():
    n = 1152 * 3
    pcm = np.stack([_sine(n), _sine(n, f=700.0, amp=0.4)], axis=1)
    blob = L3.encode_layer3(
        pcm, sr=32000, max_code=255, ms_stereo=True, short_blocks=True
    )
    y, _ = L3.decode_layer3_samples(blob, 0, len(blob))
    m = min(n, len(y) - DELAY) - 1152
    for ch in range(2):
        a, b = pcm[:m, ch], y[DELAY : DELAY + m, ch]
        corr = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
        assert corr > 0.97


def test_short_transform_identities():
    """The short chain's own TDAC + the reorder permutation."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, L3.BLK))
    carry = np.zeros(L3.BLK)
    specs = []
    for g in range(8):
        specs.append(L3.mdct_short(np.concatenate([carry, x[g]])))
        carry = x[g]
    rec_carry = np.zeros(L3.BLK)
    outs = []
    for g in range(8):
        y = L3.imdct_short(specs[g])
        outs.append(y[: L3.BLK] + rec_carry)
        rec_carry = y[L3.BLK :]
    assert np.abs(np.array(outs)[1:] - x[:-1]).max() < 1e-12
    assert sorted(L3.SHORT_PERM.tolist()) == list(range(L3.LINES))
    # subblock gain scales each window by 2^(-2 per step)
    g = L3.GranuleInfo(window_switching=1, block_type=2,
                       global_gain=210, subblock_gain=(0, 1, 0))
    sf = [[0] * 12 for _ in range(3)]
    codes = np.zeros(L3.LINES, dtype=np.int64)
    codes[:] = 1
    vals = L3.requantize_short(g, sf, codes)
    wm = vals.reshape(3, 192)
    assert np.allclose(wm[1], wm[0] / 4.0)


def test_reservoir_underrun_is_an_error():
    x = _sine(1152)
    blob = bytearray(L3.encode_layer3(x, sr=32000))
    # main_data_begin is the first 9 bits after the 4-byte header;
    # setting it nonzero on the FIRST frame claims bytes that were
    # never transmitted
    blob[4] |= 0x80
    with pytest.raises(Mp3Error, match="reservoir"):
        L3.decode_layer3_samples(bytes(blob), 0, len(blob))

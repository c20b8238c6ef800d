"""Ogg Vorbis codec (engine profile): bit-packing, codebooks, floor1,
residue2, headers, and end-to-end round trips through CRC-valid Ogg
pages.

Alignment note: with equal blocksizes (N=256) and the first frame's
left overlap discarded, decoded sample i corresponds to input sample
i + N/2 — all end-to-end assertions compare y against x[128:].
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from audio_feature_extraction_spark.multimodal import vorbis as V
from audio_feature_extraction_spark.multimodal.ogg import parse_ogg, parse_pages

HALF = 128


def _snr(ref: np.ndarray, out: np.ndarray) -> float:
    m = min(len(ref) - HALF, len(out)) - HALF
    a, b = ref[HALF : HALF + m], out[:m]
    return float(10 * np.log10((a * a).sum() / ((a - b) ** 2).sum()))


# ---------------------------------------------------------------------------
# bit packing + codebooks
# ---------------------------------------------------------------------------


def test_lsb_bit_packing_roundtrip():
    rng = random.Random(1)
    fields = [(rng.randrange(1 << w), w) for w in
              (1, 3, 8, 13, 24, 32, 5, 7) for _ in range(20)]
    bw = V.LsbWriter()
    for v, w in fields:
        bw.write(v, w)
    br = V.LsbReader(bw.tobytes())
    assert [(br.read(w), w) for _, w in fields] == fields
    # LSB-first byte layout: writing 1 as a single bit sets bit 0
    bw = V.LsbWriter()
    bw.write(1, 1)
    assert bw.tobytes() == b"\x01"


def test_codeword_assignment_is_spec_first_fit():
    """The spec's worked example (§3.2.1): lengths [2,4,4,4,4,2,3,3]
    assign in entry order to 00, 0100, 0101, 0110, 0111, 10, 110, 111."""
    codes = V.assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert codes == [0b00, 0b0100, 0b0101, 0b0110, 0b0111, 0b10, 0b110, 0b111]


def test_codeword_assignment_rejects_oversubscription():
    with pytest.raises(V.VorbisError, match="over-subscribed"):
        V.assign_codewords([2, 2, 2, 3, 4, 4, 3])


def test_codebook_bitstream_roundtrip_sparse_and_vq():
    rng = random.Random(2)
    cb = V.Codebook(1, [0, 3, 3, 2, 0, 3, 3, 2])
    bw = V.LsbWriter()
    V.write_codebook(bw, cb)
    cb2 = V.read_codebook(V.LsbReader(bw.tobytes()))
    assert cb2.lengths == cb.lengths and cb2.lookup_type == 0
    syms = [rng.choice([1, 2, 3, 5, 6, 7]) for _ in range(300)]
    bw = V.LsbWriter()
    for s in syms:
        cb.write_code(bw, s)
    br = V.LsbReader(bw.tobytes())
    assert [cb2.read_code(br) for _ in syms] == syms
    # lookup-2 vectors round-trip through the vorbis float packing
    mult = [rng.randrange(16) for _ in range(16)]
    vq = V.Codebook(2, [3] * 8, lookup_type=2, minimum_value=-1.0,
                    delta_value=0.125, value_bits=4, sequence_p=1,
                    multiplicands=mult)
    bw = V.LsbWriter()
    V.write_codebook(bw, vq)
    vq2 = V.read_codebook(V.LsbReader(bw.tobytes()))
    for e in range(8):
        assert np.allclose(vq.vq_vector(e), vq2.vq_vector(e), atol=1e-6)


def test_vorbis_float32_pack():
    for x in (0.0, 1.0, -0.125, 3.75, 1e-3, -256.0, 2.0 / 255.0):
        u = V._float32_unpack(V._float32_pack(x))
        assert abs(u - x) <= abs(x) * 1e-6


# ---------------------------------------------------------------------------
# floor1 + residue structures
# ---------------------------------------------------------------------------


def test_floor1_config_roundtrip_and_curves():
    fl = V.Floor1([0], [3], [0], [-1], [[0]], 1, [0, 128, 32, 64, 96])
    bw = V.LsbWriter()
    V.write_floor1(bw, fl)
    assert V.read_floor1(V.LsbReader(bw.tobytes())) == fl
    flat = V.floor1_curve(fl, [200] * 5, 128)
    assert np.allclose(flat, V._floor1_db(200))
    rising = V.floor1_curve(fl, [100, 200, 125, 150, 175], 128)
    assert np.all(np.diff(rising) >= 0)
    assert rising[0] == V._floor1_db(100)


def test_residue2_config_roundtrip():
    rs = V.Residue2(0, 128, 32, 2, 1, [[-1], [2]])
    bw = V.LsbWriter()
    V.write_residue2(bw, rs)
    rs2 = V.read_residue2(V.LsbReader(bw.tobytes()))
    assert rs2 == rs


def test_headers_roundtrip():
    s = V.default_setup(2, 44100, 256)
    s2 = V.parse_headers(V.build_id_header(s), V.build_setup_header(s))
    assert s2.channels == 2 and s2.sample_rate == 44100
    assert s2.blocksize == 256
    assert len(s2.codebooks) == 3
    assert s2.floor == s.floor
    assert s2.residue == s.residue


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_vorbis_window_princen_bradley():
    w = V.vorbis_window(256)
    assert np.allclose(w[:128] ** 2 + w[128:] ** 2, 1.0)


def test_mdct_tdac_with_vorbis_window():
    rng = np.random.default_rng(3)
    n = 128 * 12
    x = rng.standard_normal(n)
    win = V.vorbis_window(256)
    cos, cos_t = V._mdct_mats(256)
    specs = [V.mdct_forward(x[f * 128 : f * 128 + 256], win, cos_t)
             for f in range(n // 128 - 1)]
    carry = np.zeros(128)
    outs = []
    for X in specs:
        y = V.mdct_inverse(X, win, cos)
        outs.append(y[:128] + carry)
        carry = y[128:]
    out = np.concatenate(outs[1:])
    assert np.abs(out - x[128 : 128 + len(out)]).max() < 1e-12


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------


def test_roundtrip_mono_noise():
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.7, 0.7, 128 * 40)
    blob = V.encode_vorbis(x, sr=32000)
    y, sr = V.decode_vorbis_samples(blob)
    assert sr == 32000 and y.ndim == 1
    assert _snr(x, y) > 35.0


def test_roundtrip_sine_and_probe_agree():
    sr = 48000
    t = np.arange(128 * 30)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / sr)
    blob = V.encode_vorbis(x, sr=sr)
    assert _snr(x, V.decode_vorbis_samples(blob)[0]) > 35.0
    info = parse_ogg(blob)          # CRC-verified page walk
    assert info.codec == "vorbis" and info.sample_rate == sr
    assert info.channels == 1


def test_roundtrip_stereo():
    rng = np.random.default_rng(9)
    n = 128 * 25
    pcm = np.stack(
        [rng.uniform(-0.6, 0.6, n), rng.uniform(-0.4, 0.4, n)], axis=1
    )
    blob = V.encode_vorbis(pcm, sr=44100)
    y, sr = V.decode_vorbis_samples(blob)
    assert sr == 44100 and y.shape[1] == 2
    for ch in range(2):
        assert _snr(pcm[:, ch], y[:, ch]) > 35.0


def test_silent_channel_flag():
    """An all-zero stretch uses the floor 'nonzero' flag and the silent
    residue class; the decode is exact zero there."""
    x = np.zeros(128 * 20)
    x[128 * 10 :] = 0.3 * np.sin(np.arange(128 * 10) * 0.07)
    blob = V.encode_vorbis(x, sr=32000)
    y, _ = V.decode_vorbis_samples(blob)
    assert np.allclose(y[: 128 * 8], 0.0)
    assert float(np.abs(y[128 * 10 :]).max()) > 0.1


def test_packet_reassembly_across_lacing():
    """A >255-byte packet spans multiple lacing values; reassembly must
    restore it exactly (the setup header is the natural big packet)."""
    s = V.default_setup(1, 32000, 256)
    setup = V.build_setup_header(s)
    assert len(setup) > 255  # exercises the 255-lacing split
    page = V._ogg_page(7, 0, 0, [setup])
    pages = parse_pages(page)
    pkts, partial = V._split_packets(page, pages[0], b"")
    assert partial == b"" and pkts == [setup]


def test_seams_are_explicit():
    s = V.default_setup(1, 32000, 256)
    # two blocksizes -> window-switching seam
    bw = V.LsbWriter()
    V._header_common(bw, 1)
    bw.write(0, 32)
    bw.write(1, 8)
    bw.write(32000, 32)
    bw.write(0, 96)
    bw.write(8, 4)
    bw.write(9, 4)   # blocksize_1 != blocksize_0
    bw.write(1, 1)
    with pytest.raises(V.VorbisError, match="blocksize"):
        V.parse_headers(bw.tobytes(), V.build_setup_header(s))

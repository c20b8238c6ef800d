"""MPEG-1 audio Layer I/II SAMPLE codec — pure numpy, public spec
structure (ISO/IEC 11172-3 §2.4.2.5-6 bitstream layout; the reference's
format list is WAV/FLAC/MP3/OGG, design.md:451-475, requirements.md:18).

What is spec-faithful here: the frame walk (multimodal/mpeg.py header
parsing), Layer I/II field structure (bit allocation, scfsi patterns,
scalefactor transmission, 12-granule sample layout, Layer II 3-sample
grouping for 3/5/9-level quantizers), the scalefactor table (analytic:
sf[i] = 2·2^(-i/3)), and the 32-band polyphase filterbank's
analytically-defined cosine modulation (cos((2i+1)(n∓16)π/64), 512
taps, intrinsic delay 481).

What is engine-canonical rather than ISO-tabulated (the repo copies no
spec lookup tables):

* the filterbank window pair is DESIGNED from scratch
  (scripts/gen_pr_windows.py: SRRC prototype + alternating least
  squares; ~60 dB reconstruction — quantization noise dominates at
  every allocation below ~10 bits);
* sample requantization is the uniform midtread map
  code -> (2·code/(levels-1)) - 1, the affine equivalent of ISO's
  (C, D) Table 3-B.4 form;
* the Layer II allocation table follows Table 3-B.2a's LAYOUT
  (27 subbands: 4/4/3/2 allocation bits by region) with
  engine-canonical level lists.

Consequence, stated honestly: streams produced by the paired encoder
here (the deterministic fixture generator, same tables and windows)
round-trip through the decoder at quantizer-limited SNR (tested);
third-party MP3 Layer I/II streams parse structurally but would need
the ISO window/requant/allocation tables dropped into this module's
seams for faithful audio. Layer III decodes for real via
multimodal/mpeg_layer3.py (side info, Huffman, requantize, alias
reduction, IMDCT, shared polyphase) with the same engine-table policy;
its remaining seams are short/start/stop blocks and intensity stereo.
"""

from __future__ import annotations

import numpy as np

from audio_feature_extraction_spark.multimodal._pr_windows import windows
from audio_feature_extraction_spark.multimodal.mpeg import (
    _BITRATES,
    _SAMPLE_RATES,
    Mp3Error,
    _id3v2_size,
    parse_frame_header,
)

FILTERBANK_DELAY = 481

# scalefactor table — analytic, sf[i] = 2 * 2^(-i/3) (63 entries)
SCALEFACTORS = 2.0 * np.exp2(-np.arange(63) / 3.0)

# Layer II allocation table, Table 3-B.2a LAYOUT (allocation-field
# widths 4/4/3/2 by subband region), engine-canonical levels. Index 0
# always means "no bits". Engine-canonical sblimit is 32 (ISO's tables
# stop at 27/30; the designed filterbank window leaks more stopband
# energy into top subbands than ISO's, so zeroing them would floor the
# round-trip SNR at ~20 dB — at our sblimit the codec stays
# quantizer-limited, which is what the tests assert).
_L2_HIGH = [3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
            32767, 65535]
_L2_MID = [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
           65535]
_L2_LOW = [3, 7, 15, 31, 63, 255, 1023]
_L2_LOWEST = [7, 31, 255]
L2_SBLIMIT = 32


def l2_alloc_row(sb: int) -> tuple[int, list[int]]:
    """(allocation-field bits, nlevels list) for subband ``sb``."""
    if sb < 3:
        return 4, _L2_HIGH
    if sb < 11:
        return 4, _L2_MID
    if sb < 23:
        return 3, _L2_LOW
    return 2, _L2_LOWEST


def _grouped(levels: int) -> bool:
    return levels in (3, 5, 9)


def _code_bits(levels: int) -> int:
    """Bits per (possibly grouped) code word."""
    if levels == 3:
        return 5      # 3^3 = 27 <= 32
    if levels == 5:
        return 7      # 5^3 = 125 <= 128
    if levels == 9:
        return 10     # 9^3 = 729 <= 1024
    return int(levels + 1).bit_length() - 1  # levels = 2^nb - 1 -> nb


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class BitReader:
    def __init__(self, data: bytes, start_bit: int = 0):
        self.data = data
        self.pos = start_bit

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self, pad_to: int | None = None) -> bytes:
        bits = list(self.bits)
        if pad_to is not None:
            if len(bits) > pad_to * 8:
                raise ValueError(
                    f"payload {len(bits)} bits exceeds {pad_to} bytes"
                )
            bits += [0] * (pad_to * 8 - len(bits))
        elif len(bits) % 8:
            bits += [0] * (8 - len(bits) % 8)
        out = bytearray(len(bits) // 8)
        for i, b in enumerate(bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


# ---------------------------------------------------------------------------
# 32-band polyphase filterbank (ISO flow, designed windows)
# ---------------------------------------------------------------------------

_MA = np.cos(
    (2 * np.arange(32)[:, None] + 1) * (np.arange(64)[None, :] - 16) * np.pi / 64
)
_MS = np.cos(
    (16 + np.arange(64)[:, None]) * (2 * np.arange(32)[None, :] + 1) * np.pi / 64
)


class Analyzer:
    """Streaming analysis: 32 PCM samples in -> 32 subband samples out.
    State (the 512-sample X buffer) persists across frames, as the spec
    requires."""

    def __init__(self):
        self._h, _ = windows()
        self._x = np.zeros(512)

    def push(self, block32: np.ndarray) -> np.ndarray:
        self._x[32:] = self._x[:-32]
        self._x[:32] = block32[::-1]
        y = (self._h * self._x).reshape(8, 64).sum(axis=0)
        return _MA @ y


class Synthesizer:
    """Streaming synthesis: 32 subband samples in -> 32 PCM samples out.
    State (the 1024-sample V FIFO) persists across frames."""

    def __init__(self):
        _, self._d = windows()
        self._v = np.zeros(1024)

    def push(self, s32: np.ndarray) -> np.ndarray:
        self._v[64:] = self._v[:-64]
        self._v[:64] = _MS @ s32
        u = np.empty(512)
        for q in range(8):
            u[64 * q : 64 * q + 32] = self._v[128 * q : 128 * q + 32]
            u[64 * q + 32 : 64 * q + 64] = self._v[128 * q + 96 : 128 * q + 128]
        return (u * self._d).reshape(16, 32).sum(axis=0)


def synthesize_blocks(subband: np.ndarray) -> np.ndarray:
    """(nblk, 32) subband samples -> (nblk*32,) PCM via one stateful
    synthesis run."""
    syn = Synthesizer()
    out = np.empty(subband.shape[0] * 32)
    for t in range(subband.shape[0]):
        out[32 * t : 32 * t + 32] = syn.push(subband[t])
    return out


def analyze_blocks(pcm: np.ndarray) -> np.ndarray:
    """(n,) PCM (n multiple of 32) -> (n/32, 32) subband samples."""
    if len(pcm) % 32:
        raise ValueError("pcm length must be a multiple of 32")
    ana = Analyzer()
    nblk = len(pcm) // 32
    out = np.empty((nblk, 32))
    for t in range(nblk):
        out[t] = ana.push(pcm[32 * t : 32 * t + 32])
    return out


# ---------------------------------------------------------------------------
# quantization (uniform midtread; affine-equivalent of ISO C/D form)
# ---------------------------------------------------------------------------

def _dequant(code: np.ndarray, levels: int) -> np.ndarray:
    return (2.0 * code) / (levels - 1) - 1.0


def _quant(frac: np.ndarray, levels: int) -> np.ndarray:
    code = np.rint((frac + 1.0) * (levels - 1) / 2.0).astype(np.int64)
    return np.clip(code, 0, levels - 1)


def _pick_scalefactor(maxabs: float) -> int:
    """Smallest scalefactor (largest index) still >= maxabs."""
    idx = np.searchsorted(-SCALEFACTORS, -maxabs, side="right") - 1
    return int(max(0, min(62, idx)))


# ---------------------------------------------------------------------------
# Layer I
# ---------------------------------------------------------------------------

def _decode_layer1_frame(br: BitReader, nch: int) -> np.ndarray:
    """-> (12, 32, nch) subband samples."""
    alloc = np.zeros((nch, 32), dtype=np.int64)
    for sb in range(32):
        for ch in range(nch):
            a = br.read(4)
            if a == 15:
                raise Mp3Error("forbidden Layer I allocation 15")
            alloc[ch, sb] = a
    sf = np.zeros((nch, 32))
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch, sb]:
                sf[ch, sb] = SCALEFACTORS[br.read(6)]
    out = np.zeros((12, 32, nch))
    for g in range(12):
        for sb in range(32):
            for ch in range(nch):
                a = alloc[ch, sb]
                if a:
                    nb = a + 1
                    code = br.read(nb)
                    out[g, sb, ch] = (
                        _dequant(np.array(code), (1 << nb) - 1) * sf[ch, sb]
                    )
    return out


def _encode_layer1_frame(
    bw: BitWriter, sub: np.ndarray, nbits: int
) -> None:
    """(12, 32, nch) subband samples -> frame payload bits (uniform
    ``nbits`` allocation on every subband)."""
    nch = sub.shape[2]
    a = nbits - 1
    for _sb in range(32):
        for _ch in range(nch):
            bw.write(a, 4)
    sf_idx = np.zeros((nch, 32), dtype=np.int64)
    for sb in range(32):
        for ch in range(nch):
            sf_idx[ch, sb] = _pick_scalefactor(
                float(np.abs(sub[:, sb, ch]).max())
            )
            bw.write(int(sf_idx[ch, sb]), 6)
    levels = (1 << nbits) - 1
    for g in range(12):
        for sb in range(32):
            for ch in range(nch):
                sfv = SCALEFACTORS[sf_idx[ch, sb]]
                frac = sub[g, sb, ch] / sfv
                bw.write(int(_quant(np.array(frac), levels)), nbits)


# ---------------------------------------------------------------------------
# Layer II
# ---------------------------------------------------------------------------

def _decode_layer2_frame(br: BitReader, nch: int) -> np.ndarray:
    """-> (36, 32, nch) subband samples."""
    alloc = np.zeros((nch, L2_SBLIMIT), dtype=np.int64)
    for sb in range(L2_SBLIMIT):
        bits, _levels = l2_alloc_row(sb)
        for ch in range(nch):
            alloc[ch, sb] = br.read(bits)
    scfsi = np.zeros((nch, L2_SBLIMIT), dtype=np.int64)
    for sb in range(L2_SBLIMIT):
        for ch in range(nch):
            if alloc[ch, sb]:
                scfsi[ch, sb] = br.read(2)
    sf = np.zeros((nch, L2_SBLIMIT, 3))
    for sb in range(L2_SBLIMIT):
        for ch in range(nch):
            if not alloc[ch, sb]:
                continue
            pat = scfsi[ch, sb]
            if pat == 0:
                v = [br.read(6), br.read(6), br.read(6)]
            elif pat == 1:
                a, b = br.read(6), br.read(6)
                v = [a, a, b]
            elif pat == 2:
                a = br.read(6)
                v = [a, a, a]
            else:
                a, b = br.read(6), br.read(6)
                v = [a, b, b]
            sf[ch, sb] = SCALEFACTORS[v]
    out = np.zeros((36, 32, nch))
    for g in range(12):
        part = g // 4  # scalefactor part (0..2)
        for sb in range(L2_SBLIMIT):
            _bits, levels_row = l2_alloc_row(sb)
            for ch in range(nch):
                a = alloc[ch, sb]
                if not a:
                    continue
                levels = levels_row[a - 1]
                sfv = sf[ch, sb, part]
                if _grouped(levels):
                    c = br.read(_code_bits(levels))
                    for k in range(3):
                        out[3 * g + k, sb, ch] = (
                            _dequant(np.array(c % levels), levels) * sfv
                        )
                        c //= levels
                else:
                    nb = _code_bits(levels)
                    for k in range(3):
                        code = br.read(nb)
                        out[3 * g + k, sb, ch] = (
                            _dequant(np.array(code), levels) * sfv
                        )
    return out


def _encode_layer2_frame(
    bw: BitWriter, sub: np.ndarray, alloc_idx: np.ndarray
) -> None:
    """(36, 32, nch) subband samples + per-(ch, sb) allocation index ->
    payload bits. Uses scfsi=0 (three scalefactors) or scfsi=2 when all
    parts share one scalefactor — both decode paths get exercised."""
    nch = sub.shape[2]
    for sb in range(L2_SBLIMIT):
        bits, _levels = l2_alloc_row(sb)
        for ch in range(nch):
            bw.write(int(alloc_idx[ch, sb]), bits)
    sf_idx = np.zeros((nch, L2_SBLIMIT, 3), dtype=np.int64)
    scfsi = np.zeros((nch, L2_SBLIMIT), dtype=np.int64)
    for sb in range(L2_SBLIMIT):
        for ch in range(nch):
            if not alloc_idx[ch, sb]:
                continue
            for part in range(3):
                seg = sub[12 * part : 12 * (part + 1), sb, ch]
                sf_idx[ch, sb, part] = _pick_scalefactor(
                    float(np.abs(seg).max())
                )
            if (
                sf_idx[ch, sb, 0]
                == sf_idx[ch, sb, 1]
                == sf_idx[ch, sb, 2]
            ):
                scfsi[ch, sb] = 2
            bw.write(int(scfsi[ch, sb]), 2)
    for sb in range(L2_SBLIMIT):
        for ch in range(nch):
            if not alloc_idx[ch, sb]:
                continue
            if scfsi[ch, sb] == 2:
                bw.write(int(sf_idx[ch, sb, 0]), 6)
            else:
                for part in range(3):
                    bw.write(int(sf_idx[ch, sb, part]), 6)
    for g in range(12):
        part = g // 4
        for sb in range(L2_SBLIMIT):
            _bits, levels_row = l2_alloc_row(sb)
            for ch in range(nch):
                a = alloc_idx[ch, sb]
                if not a:
                    continue
                levels = levels_row[a - 1]
                sfv = SCALEFACTORS[sf_idx[ch, sb, part]]
                codes = [
                    int(
                        _quant(
                            np.array(sub[3 * g + k, sb, ch] / sfv), levels
                        )
                    )
                    for k in range(3)
                ]
                if _grouped(levels):
                    c = (
                        codes[0]
                        + codes[1] * levels
                        + codes[2] * levels * levels
                    )
                    bw.write(c, _code_bits(levels))
                else:
                    nb = _code_bits(levels)
                    for k in range(3):
                        bw.write(codes[k], nb)


# ---------------------------------------------------------------------------
# stream-level decode / encode
# ---------------------------------------------------------------------------

def decode_mpeg_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode every Layer I/II frame of an MPEG audio payload.

    Returns (samples, sample_rate): mono -> (n,) float64; stereo ->
    (n, 2). Layer III streams dispatch to the full
    multimodal/mpeg_layer3 path (long blocks, LR/MS stereo);
    joint/intensity stereo on Layers I/II raises Mp3Error."""
    b = bytes(payload)
    pos = _id3v2_size(b)
    end = len(b)
    if end >= 128 and b[end - 128 : end - 125] == b"TAG":
        end -= 128
    per_ch_blocks: list[np.ndarray] | None = None
    sr = None
    nch = None
    while pos + 4 <= end:
        hdr = parse_frame_header(b, pos, end)
        if hdr is None:
            nxt = b.find(b"\xff", pos + 1, end)
            while nxt != -1 and parse_frame_header(b, nxt, end) is None:
                nxt = b.find(b"\xff", nxt + 1, end)
            if nxt == -1:
                break
            pos = nxt
            continue
        if hdr.layer == 3:
            # full Layer III path (side info, Huffman, requantize,
            # alias reduction, IMDCT, shared polyphase) — needs
            # cross-frame state (bit reservoir, overlap-add), so the
            # whole remaining payload is handed over
            from audio_feature_extraction_spark.multimodal.mpeg_layer3 import (
                decode_layer3_samples,
            )

            if per_ch_blocks is not None:
                raise Mp3Error("mixed layers in one stream")
            return decode_layer3_samples(b, pos, end)
        if hdr.channel_mode == "joint_stereo":
            raise Mp3Error("intensity/joint stereo not supported")
        if pos + hdr.frame_bytes > end:
            break  # truncated final frame
        this_nch = 1 if hdr.channel_mode == "mono" else 2
        if sr is None:
            sr, nch = hdr.sample_rate, this_nch
        elif hdr.sample_rate != sr or this_nch != nch:
            raise Mp3Error("sample rate / channel change mid-stream")
        start_bit = (pos + 4 + (2 if hdr.protected else 0)) * 8
        br = BitReader(b, start_bit)
        if hdr.layer == 1:
            sub = _decode_layer1_frame(br, nch)
        else:
            sub = _decode_layer2_frame(br, nch)
        if per_ch_blocks is None:
            per_ch_blocks = []
        per_ch_blocks.append(sub)
        pos += hdr.frame_bytes
    if per_ch_blocks is None or sr is None:
        raise Mp3Error("no decodable MPEG audio frame found")
    sub_all = np.concatenate(per_ch_blocks, axis=0)  # (nblk, 32, nch)
    chans = [
        synthesize_blocks(sub_all[:, :, ch]) for ch in range(nch)
    ]
    out = chans[0] if nch == 1 else np.stack(chans, axis=1)
    return out, sr


def _build_header(
    layer: int, kbps: int, sr: int, nch: int
) -> bytes:
    br_idx = _BITRATES[(1, layer)].index(kbps)
    sr_idx = _SAMPLE_RATES[3].index(sr)
    mode = 3 if nch == 1 else 0
    h = (0x7FF << 21) | (3 << 19) | ((4 - layer) << 17) | (1 << 16)
    h |= (br_idx << 12) | (sr_idx << 10) | (0 << 9) | (mode << 6)
    return h.to_bytes(4, "big")


def _frame_bytes(layer: int, kbps: int, sr: int) -> int:
    if layer == 1:
        return (12 * kbps * 1000 // sr) * 4
    return 144 * kbps * 1000 // sr


def _pick_bitrate(layer: int, sr: int, need_bytes: int) -> int:
    for kbps in _BITRATES[(1, layer)][1:]:
        if _frame_bytes(layer, kbps, sr) >= need_bytes:
            return kbps
    raise ValueError(f"no layer {layer} bitrate fits {need_bytes} bytes")


def encode_mpeg(
    pcm: np.ndarray,
    sr: int = 32000,
    layer: int = 2,
    nbits: int = 8,
) -> bytes:
    """Deterministic fixture encoder: PCM in [-2, 2) -> MPEG-1 Layer
    I/II stream decodable by :func:`decode_mpeg_samples` (same tables,
    same windows — the self-consistency contract the codec tests
    verify). ``nbits`` sets a uniform allocation: Layer I uses
    ``nbits``-bit codes everywhere; Layer II uses the closest
    2^nbits - 1 level row available per subband (upper subbands get the
    coarser rows their table region allows). Mono (n,) or stereo
    (n, 2); input is cropped to whole frames.
    """
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    nch = pcm.shape[1]
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    if sr not in _SAMPLE_RATES[3]:
        raise ValueError(f"MPEG-1 sample rates only: {_SAMPLE_RATES[3]}")
    spf = 384 if layer == 1 else 1152
    nframes = pcm.shape[0] // spf
    if nframes == 0:
        raise ValueError(f"need at least {spf} samples")
    analyzers = [Analyzer() for _ in range(nch)]

    if layer == 1:
        payload_bits = 32 * nch * 4 + 32 * nch * 6 + 12 * 32 * nch * nbits
    else:
        alloc_idx = np.zeros((nch, L2_SBLIMIT), dtype=np.int64)
        payload_bits = 0
        for sb in range(L2_SBLIMIT):
            bits, levels_row = l2_alloc_row(sb)
            # first row entry with AT LEAST the wanted resolution (the
            # designed filterbank's stopband leaks more than ISO's, so
            # under-quantizing a leaky upper band floors the SNR), else
            # the finest the region offers
            want = (1 << nbits) - 1
            best = next(
                (
                    i
                    for i in range(len(levels_row))
                    if levels_row[i] >= want
                ),
                len(levels_row) - 1,
            )
            for ch in range(nch):
                alloc_idx[ch, sb] = best + 1
            levels = levels_row[best]
            per_code = (
                _code_bits(levels)
                if _grouped(levels)
                else 3 * _code_bits(levels)
            )
            payload_bits += nch * (bits + 2 + 18 + 12 * per_code)
    need = 4 + (payload_bits + 7) // 8
    kbps = _pick_bitrate(layer, sr, need)
    fbytes = _frame_bytes(layer, kbps, sr)

    out = bytearray()
    for f in range(nframes):
        subs = []
        for ch in range(nch):
            seg = pcm[f * spf : (f + 1) * spf, ch]
            blocks = np.stack(
                [
                    analyzers[ch].push(seg[32 * t : 32 * t + 32])
                    for t in range(spf // 32)
                ]
            )
            subs.append(blocks)
        sub = np.stack(subs, axis=2)  # (blocks, 32, nch)
        bw = BitWriter()
        if layer == 1:
            _encode_layer1_frame(bw, sub, nbits)
        else:
            _encode_layer2_frame(bw, sub, alloc_idx)
        out += _build_header(layer, kbps, sr, nch)
        out += bw.tobytes(pad_to=fbytes - 4)
    return bytes(out)

"""MPEG-1 audio Layer III ("MP3") sample codec — pure numpy/python,
public spec structure (ISO/IEC 11172-3 §2.4.1.7 side-info layout,
§2.4.2.7 main-data semantics, §2.4.3.4 decode flow; reference format
list design.md:451-475, requirements.md:18).

Spec-faithful structure (what makes this a real Layer III path, not a
renamed Layer II): the MPEG-1 side-info bitstream layout (17/32 bytes,
main_data_begin bit reservoir, scfsi, per-granule part2_3_length /
big_values / global_gain / scalefac_compress / region and table
selects), the three-region spectrum partition (big-value pairs,
count1 quadruples, rzero), Huffman-coded pairs with linbits ESC and
per-value sign bits, the x^(4/3) power-law requantizer with
global_gain / scalefac_scale / preflag exponents, mid-side stereo
((M±S)/sqrt2), the 8-butterfly alias reduction between adjacent
subbands, the 18-coefficient MDCT with sine window and half-block
overlap-add (TDAC), frequency inversion, and the shared 32-band
polyphase synthesis (multimodal/mpeg_decode.Synthesizer).

Engine-canonical rather than ISO-tabulated (the repo ships no spec
lookup tables — same policy as the Layer I/II codec; the seams are
where ISO's tables would drop in for third-party streams):

* HUFFMAN CODE TABLES are built deterministically at import: canonical
  Huffman codes from fixed integer weights w(x, y) favoring small
  values (engine tables 1-4 with linbits 0/4/8/13; count1 table 0),
  plus the fixed 4-bit count1 table 1.  The codec machinery —
  canonical construction, prefix decode, ESC/linbits, sign bits — is
  exactly the ISO shape; the code assignments are this engine's.
* SCALEFACTOR BAND EDGES follow an analytic geometric-growth rule
  (22 long bands partitioning 576 lines; slen1 bands 0-10, slen2
  11-20, band 21 bare — the ISO split), not ISO's per-rate tables.
* slen pairs are analytic (slen1 = sc >> 2, slen2 = sc & 3) and the
  preflag pretab is the analytic ramp min(3, band - 10).

Long blocks (block_type 0) AND short blocks (block_type 2) both
decode and encode: short granules run three 12-point MDCTs per subband
with the ISO reorder (transmission by scalefactor band, then window),
per-window scalefactors and subblock gains, and no alias reduction.
The remaining seams are the start/stop transition windows (block_type
1/3 — our fixture encoder switches whole streams, so transitions never
arise; a real ISO stream needs them), mixed blocks, and intensity
stereo.  Streams from the paired encoder round-trip at
quantizer-limited SNR (tested); third-party MP3s parse
(multimodal/mpeg.py) but need the ISO tables in these seams to produce
faithful audio.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from audio_feature_extraction_spark.multimodal.mpeg import (
    Mp3Error,
    parse_frame_header,
)
from audio_feature_extraction_spark.multimodal.mpeg_decode import (
    Analyzer,
    BitReader,
    BitWriter,
    Synthesizer,
    _build_header,
    _frame_bytes,
    _pick_bitrate,
)

GRANULES = 2
SUBBANDS = 32
LINES = 576  # spectral lines per granule (32 subbands x 18)
BLK = 18

SQRT2 = math.sqrt(2.0)


# ---------------------------------------------------------------------------
# Engine-canonical scalefactor bands (22 long bands over 576 lines)
# ---------------------------------------------------------------------------


def _long_band_widths() -> list[int]:
    """Analytic geometric-growth widths: 6 leading 4-line bands, then
    22%% growth rounded to even, last band absorbs the remainder."""
    widths = [4] * 6
    w = 4.0
    while len(widths) < 21:
        w *= 1.22
        widths.append(int(round(w / 2) * 2))
    rest = LINES - sum(widths)
    if not widths[-1] < rest <= 2 * widths[-1] + 20:
        raise AssertionError("band rule must leave a non-shrinking tail")
    widths.append(rest)
    return widths


LONG_WIDTHS = _long_band_widths()
LONG_EDGES = [0]
for _w in LONG_WIDTHS:
    LONG_EDGES.append(LONG_EDGES[-1] + _w)
assert LONG_EDGES[-1] == LINES and len(LONG_WIDTHS) == 22

SLEN1_BANDS = 11   # bands 0-10 coded with slen1 (ISO split)
SLEN2_BANDS = 10   # bands 11-20 with slen2; band 21 has no scalefactor
N_SFB = 21         # transmitted scalefactors per granule-channel


# -- short blocks: 3 windows x 192 lines, 12 bands per window ---------------


def _short_band_widths() -> list[int]:
    """Analytic geometric-growth widths for one short window: 4 leading
    4-line bands, then 36%% growth rounded to even, tail absorbs."""
    widths = [4] * 4
    w = 4.0
    while len(widths) < 11:
        w *= 1.36
        widths.append(int(round(w / 2) * 2))
    rest = LINES // 3 - sum(widths)
    if not widths[-1] < rest <= 2 * widths[-1] + 10:
        raise AssertionError("short band rule must leave a sane tail")
    widths.append(rest)
    return widths


SHORT_WIDTHS = _short_band_widths()
SHORT_EDGES = [0]
for _w in SHORT_WIDTHS:
    SHORT_EDGES.append(SHORT_EDGES[-1] + _w)
assert SHORT_EDGES[-1] == LINES // 3 and len(SHORT_WIDTHS) == 12

N_SFB_SHORT = 12          # per window; slen1 bands 0-5, slen2 6-11
SLEN1_BANDS_SHORT = 6


def _short_perm() -> "np.ndarray":
    """Transmitted order -> window-major flat index.

    ISO transmits short-block lines by scalefactor band, then window,
    then line within the band (the "reorder" the decoder undoes);
    window-major index = window * 192 + line.
    """
    perm = np.empty(LINES, dtype=np.int64)
    t = 0
    for b in range(N_SFB_SHORT):
        for w in range(3):
            for line in range(SHORT_EDGES[b], SHORT_EDGES[b + 1]):
                perm[t] = w * (LINES // 3) + line
                t += 1
    assert t == LINES
    return perm


SHORT_PERM = _short_perm()
# band/window of each transmitted position (for requantizer gains)
SHORT_T_BAND = np.repeat(
    np.arange(N_SFB_SHORT), [3 * w for w in SHORT_WIDTHS]
)
SHORT_T_WIN = np.concatenate(
    [
        np.repeat(np.arange(3), SHORT_WIDTHS[b])
        for b in range(N_SFB_SHORT)
    ]
)


def _pretab(band: int) -> int:
    """Analytic preflag ramp (engine-canonical stand-in for ISO's
    pretab): upper bands get 1..3 extra scalefactor steps."""
    return min(3, max(0, band - 10))


def _slen(scalefac_compress: int) -> tuple[int, int]:
    return scalefac_compress >> 2, scalefac_compress & 0x3


# ---------------------------------------------------------------------------
# Canonical Huffman machinery (engine tables, ISO-shaped semantics)
# ---------------------------------------------------------------------------


def _huffman_lengths(weights: list[int]) -> list[int]:
    """Code lengths via a deterministic Huffman merge (ties by symbol
    order). Returns a length per symbol; Kraft-complete by
    construction."""
    import heapq

    heap = [(w, i, (i,)) for i, w in enumerate(weights)]
    heapq.heapify(heap)
    lengths = [0] * len(weights)
    if len(heap) == 1:
        return [1]
    counter = len(weights)
    while len(heap) > 1:
        w1, _, s1 = heapq.heappop(heap)
        w2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (w1 + w2, counter, s1 + s2))
        counter += 1
    return lengths


def _canonical_codes(lengths: list[int]) -> list[tuple[int, int]]:
    """(code, nbits) per symbol from lengths, canonical order (shorter
    first, then symbol index)."""
    order = sorted(range(len(lengths)), key=lambda s: (lengths[s], s))
    codes: list[tuple[int, int]] = [(0, 0)] * len(lengths)
    code = 0
    prev_len = 0
    for s in order:
        ln = lengths[s]
        code <<= ln - prev_len
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class HuffTable:
    """Prefix codec over integer symbols with a dict-based decoder."""

    def __init__(self, codes: list[tuple[int, int]]):
        self.codes = codes
        self.dec: dict[tuple[int, int], int] = {
            (c, n): s for s, (c, n) in enumerate(codes)
        }
        self.max_len = max(n for _, n in codes)

    def write(self, bw: BitWriter, symbol: int) -> int:
        c, n = self.codes[symbol]
        bw.write(c, n)
        return n

    def read(self, br: BitReader) -> int:
        c, n = 0, 0
        while n <= self.max_len:
            c = (c << 1) | br.read(1)
            n += 1
            s = self.dec.get((c, n))
            if s is not None:
                return s
        raise Mp3Error("invalid Huffman code")


def _pair_table() -> HuffTable:
    """256-symbol (x, y) pair table, x = sym >> 4, y = sym & 15; value
    15 is the linbits ESC. Deterministic weights favor small values."""
    weights = []
    for x in range(16):
        for y in range(16):
            weights.append(1 << max(0, 16 - x - y))
    return HuffTable(_canonical_codes(_huffman_lengths(weights)))


def _count1_table() -> HuffTable:
    """16-symbol quadruple table (v,w,x,y bits); weights favor sparse
    quadruples."""
    weights = [max(1, 1 << (8 - 2 * bin(s).count("1"))) for s in range(16)]
    return HuffTable(_canonical_codes(_huffman_lengths(weights)))


PAIR_TABLE = _pair_table()
COUNT1_TABLE = _count1_table()

# table id -> linbits (id 0 = zero region, no bits read/written)
TABLE_LINBITS = {1: 0, 2: 4, 3: 8, 4: 13}


def _table_for_max(maxval: int) -> int:
    for tid in (1, 2, 3, 4):
        if maxval <= 14 + ((1 << TABLE_LINBITS[tid]) - 1 if TABLE_LINBITS[tid] else 0):
            return tid
    raise Mp3Error(f"spectral value {maxval} exceeds table 4 range")


# ---------------------------------------------------------------------------
# Side info
# ---------------------------------------------------------------------------


@dataclass
class GranuleInfo:
    part2_3_length: int = 0
    big_values: int = 0
    global_gain: int = 210
    scalefac_compress: int = 0
    window_switching: int = 0
    block_type: int = 0
    table_select: tuple[int, int, int] = (1, 1, 1)
    region0_count: int = 7
    region1_count: int = 7
    subblock_gain: tuple[int, int, int] = (0, 0, 0)
    preflag: int = 0
    scalefac_scale: int = 0
    count1table_select: int = 0


@dataclass
class SideInfo:
    main_data_begin: int = 0
    scfsi: list[list[int]] = field(default_factory=list)  # [ch][4]
    granules: list[list[GranuleInfo]] = field(default_factory=list)  # [gr][ch]


def side_info_bytes(nch: int) -> int:
    return 17 if nch == 1 else 32


def parse_side_info(br: BitReader, nch: int) -> SideInfo:
    si = SideInfo()
    si.main_data_begin = br.read(9)
    br.read(5 if nch == 1 else 3)  # private bits
    si.scfsi = [[br.read(1) for _ in range(4)] for _ in range(nch)]
    si.granules = []
    for _ in range(GRANULES):
        chs = []
        for _ in range(nch):
            g = GranuleInfo()
            g.part2_3_length = br.read(12)
            g.big_values = br.read(9)
            g.global_gain = br.read(8)
            g.scalefac_compress = br.read(4)
            g.window_switching = br.read(1)
            if g.window_switching:
                g.block_type = br.read(2)
                mixed = br.read(1)
                if mixed:
                    raise Mp3Error("mixed blocks not supported")
                g.table_select = (br.read(5), br.read(5), 0)
                g.subblock_gain = tuple(br.read(3) for _ in range(3))
                # short blocks use fixed engine region boundaries
                # (_region_boundaries special-cases block_type 2)
                g.region0_count = 7
                g.region1_count = 20 - 7 - 1
            else:
                g.table_select = (br.read(5), br.read(5), br.read(5))
                g.region0_count = br.read(4)
                g.region1_count = br.read(3)
            g.preflag = br.read(1)
            g.scalefac_scale = br.read(1)
            g.count1table_select = br.read(1)
            chs.append(g)
        si.granules.append(chs)
    return si


def write_side_info(bw: BitWriter, si: SideInfo, nch: int) -> None:
    for gr_chs in si.granules:
        for g in gr_chs:
            if not 0 <= g.part2_3_length < 4096:
                raise Mp3Error(
                    f"part2_3_length {g.part2_3_length} exceeds the "
                    f"12-bit side-info field"
                )
            if not 0 <= g.big_values < 512:
                raise Mp3Error("big_values exceeds the 9-bit field")
    bw.write(si.main_data_begin, 9)
    bw.write(0, 5 if nch == 1 else 3)
    for ch in range(nch):
        for b in si.scfsi[ch]:
            bw.write(b, 1)
    for gr in range(GRANULES):
        for ch in range(nch):
            g = si.granules[gr][ch]
            bw.write(g.part2_3_length, 12)
            bw.write(g.big_values, 9)
            bw.write(g.global_gain, 8)
            bw.write(g.scalefac_compress, 4)
            bw.write(g.window_switching, 1)
            if g.window_switching:
                if g.block_type != 2:
                    raise Mp3Error(
                        "start/stop transition windows not supported"
                    )
                bw.write(g.block_type, 2)
                bw.write(0, 1)  # mixed_block_flag
                bw.write(g.table_select[0], 5)
                bw.write(g.table_select[1], 5)
                for sg in g.subblock_gain:
                    bw.write(sg, 3)
            else:
                bw.write(g.table_select[0], 5)
                bw.write(g.table_select[1], 5)
                bw.write(g.table_select[2], 5)
                bw.write(g.region0_count, 4)
                bw.write(g.region1_count, 3)
            bw.write(g.preflag, 1)
            bw.write(g.scalefac_scale, 1)
            bw.write(g.count1table_select, 1)


# ---------------------------------------------------------------------------
# Main data: scalefactors + Huffman spectrum
# ---------------------------------------------------------------------------


def _region_boundaries(g: GranuleInfo) -> tuple[int, int]:
    """(end of region0, end of region1) in LINES, clamped to
    big_values*2 — ISO semantics over the engine band edges."""
    bv_lines = g.big_values * 2
    if g.window_switching and g.block_type == 2:
        # short blocks: fixed engine split (first 3 bands x 3 windows,
        # i.e. 36 transmitted lines, then the rest; 2 tables only)
        return min(36, bv_lines), bv_lines
    r0 = LONG_EDGES[min(g.region0_count + 1, len(LONG_EDGES) - 1)]
    r1 = LONG_EDGES[
        min(g.region0_count + 1 + g.region1_count + 1, len(LONG_EDGES) - 1)
    ]
    return min(r0, bv_lines), min(r1, bv_lines)


def _read_scalefacs(
    br: BitReader, g: GranuleInfo, scfsi: list[int], prev: list[int] | None
) -> tuple[list[int], int]:
    """Scalefactors for one granule-channel; scfsi groups (granule 1
    only) copy from granule 0. Returns (scalefacs, bits_read).
    scfsi band groups over the 21 bands: 0-5, 6-10, 11-15, 16-20."""
    slen1, slen2 = _slen(g.scalefac_compress)
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
    sf = [0] * N_SFB
    bits = 0
    for gi, (lo, hi, slen) in enumerate(groups):
        if prev is not None and scfsi[gi]:
            for b in range(lo, hi):
                sf[b] = prev[b]
        else:
            for b in range(lo, hi):
                sf[b] = br.read(slen) if slen else 0
                bits += slen
    return sf, bits


def _write_scalefacs(bw: BitWriter, g: GranuleInfo, sf: list[int]) -> int:
    slen1, slen2 = _slen(g.scalefac_compress)
    bits = 0
    for b in range(N_SFB):
        slen = slen1 if b < SLEN1_BANDS else slen2
        if slen:
            bw.write(sf[b], slen)
            bits += slen
    return bits


def _read_scalefacs_short(
    br: BitReader, g: GranuleInfo
) -> tuple[list[list[int]], int]:
    """Short-block scalefactors: 12 bands x 3 windows, transmitted
    band-major then window (scfsi does not apply to short blocks).
    Returns (sf[window][band], bits_read)."""
    slen1, slen2 = _slen(g.scalefac_compress)
    sf = [[0] * N_SFB_SHORT for _ in range(3)]
    bits = 0
    for b in range(N_SFB_SHORT):
        slen = slen1 if b < SLEN1_BANDS_SHORT else slen2
        for w in range(3):
            sf[w][b] = br.read(slen) if slen else 0
            bits += slen
    return sf, bits


def _write_scalefacs_short(
    bw: BitWriter, g: GranuleInfo, sf: list[list[int]]
) -> int:
    slen1, slen2 = _slen(g.scalefac_compress)
    bits = 0
    for b in range(N_SFB_SHORT):
        slen = slen1 if b < SLEN1_BANDS_SHORT else slen2
        if slen:
            for w in range(3):
                bw.write(sf[w][b], slen)
                bits += slen
    return bits


def _read_spectrum(br: BitReader, g: GranuleInfo, part2_bits: int) -> np.ndarray:
    """Huffman-decode one granule-channel spectrum (576 ints).
    Consumes exactly part2_3_length - part2_bits bits (count1 runs
    until the budget is exhausted, per ISO)."""
    start = br.pos
    budget = g.part2_3_length - part2_bits
    x = np.zeros(LINES, dtype=np.int64)
    r0_end, r1_end = _region_boundaries(g)
    pos = 0
    for _ in range(g.big_values):
        if pos < r0_end:
            tid = g.table_select[0]
        elif pos < r1_end:
            tid = g.table_select[1]
        else:
            tid = g.table_select[2]
        if tid == 0:
            pos += 2
            continue
        linbits = TABLE_LINBITS.get(tid)
        if linbits is None:
            raise Mp3Error(f"unknown Huffman table id {tid}")
        sym = PAIR_TABLE.read(br)
        vx, vy = sym >> 4, sym & 0xF
        if vx == 15 and linbits:
            vx += br.read(linbits)
        if vx:
            vx = -vx if br.read(1) else vx
        if vy == 15 and linbits:
            vy += br.read(linbits)
        if vy:
            vy = -vy if br.read(1) else vy
        if pos + 1 >= LINES:
            raise Mp3Error("big_values overruns the spectrum")
        x[pos], x[pos + 1] = vx, vy
        pos += 2
    # count1 region: quadruples until the bit budget is exhausted; the
    # final quadruple may straddle the 576-line end (implicit zeros)
    while br.pos - start < budget and pos < LINES:
        if g.count1table_select:
            sym = br.read(4)  # fixed 4-bit table (ISO table B analog)
        else:
            sym = COUNT1_TABLE.read(br)
        for j, shift in enumerate((3, 2, 1, 0)):
            v = (sym >> shift) & 1
            if v:
                v = -1 if br.read(1) else 1
            if pos + j < LINES:
                x[pos + j] = v
            elif v:
                raise Mp3Error("nonzero count1 value beyond line 576")
        pos += 4
    if br.pos - start > budget:
        raise Mp3Error("part2_3_length overrun")
    br.pos = start + budget  # skip stuffing bits
    return x


def _write_spectrum(
    bw: BitWriter, g: GranuleInfo, x: np.ndarray
) -> int:
    """Huffman-encode (big_values pairs + count1 quadruples); returns
    bits written. g.big_values / table_select / count1 regions must
    already describe x."""
    start = len(bw.bits)
    r0_end, r1_end = _region_boundaries(g)
    pos = 0
    for _ in range(g.big_values):
        tid = g.table_select[0 if pos < r0_end else 1 if pos < r1_end else 2]
        vx, vy = int(x[pos]), int(x[pos + 1])
        if tid == 0:
            if vx or vy:
                raise Mp3Error("nonzero pair in zero-table region")
            pos += 2
            continue
        linbits = TABLE_LINBITS[tid]
        ax, ay = abs(vx), abs(vy)
        ex = min(ax, 15)
        ey = min(ay, 15)
        if (ax > 15 or ay > 15) and not linbits:
            raise Mp3Error("value needs linbits but table has none")
        PAIR_TABLE.write(bw, (ex << 4) | ey)
        if ex == 15 and linbits:
            bw.write(ax - 15, linbits)
        if ax:
            bw.write(1 if vx < 0 else 0, 1)
        if ey == 15 and linbits:
            bw.write(ay - 15, linbits)
        if ay:
            bw.write(1 if vy < 0 else 0, 1)
        pos += 2
    # count1 quadruples cover the remaining nonzero (|v| <= 1) tail
    tail_end = pos
    for i in range(LINES - 1, pos - 1, -1):
        if x[i] != 0:
            tail_end = i + 1
            break
    while (tail_end - pos) % 4:
        tail_end += 1
    for qpos in range(pos, tail_end, 4):
        sym = 0
        vals = []
        for j in range(4):
            # the final quadruple may straddle the 576-line end after
            # padding to a multiple of 4; lines beyond are implicit 0
            v = int(x[qpos + j]) if qpos + j < LINES else 0
            if abs(v) > 1:
                raise Mp3Error("count1 region value out of range")
            sym = (sym << 1) | (1 if v else 0)
            vals.append(v)
        if g.count1table_select:
            bw.write(sym, 4)
        else:
            COUNT1_TABLE.write(bw, sym)
        for v in vals:
            if v:
                bw.write(1 if v < 0 else 0, 1)
    return len(bw.bits) - start


# ---------------------------------------------------------------------------
# Requantization
# ---------------------------------------------------------------------------


def _band_of_line() -> np.ndarray:
    b = np.empty(LINES, dtype=np.int64)
    for i in range(22):
        b[LONG_EDGES[i]:LONG_EDGES[i + 1]] = i
    return b


BAND_OF_LINE = _band_of_line()


def requantize(g: GranuleInfo, sf: list[int], x: np.ndarray) -> np.ndarray:
    """code -> spectral value: sign(x) |x|^(4/3) 2^((gg-210)/4)
    2^(-mult (sf[band] + preflag*pretab[band])), mult =
    (scalefac_scale + 1)/2; band 21 carries no scalefactor."""
    mult = (g.scalefac_scale + 1) * 0.5
    sf_arr = np.array(
        [
            (sf[b] + (g.preflag * _pretab(b) if b < N_SFB else 0))
            if b < N_SFB
            else 0
            for b in range(22)
        ],
        dtype=np.float64,
    )
    gains = 2.0 ** ((g.global_gain - 210) / 4.0 - mult * sf_arr[BAND_OF_LINE])
    ax = np.abs(x).astype(np.float64)
    return np.sign(x) * np.power(ax, 4.0 / 3.0) * gains


def quantize(
    xr: np.ndarray, g: GranuleInfo, sf: list[int]
) -> np.ndarray:
    """Inverse of :func:`requantize` with round-to-nearest codes."""
    mult = (g.scalefac_scale + 1) * 0.5
    sf_arr = np.array(
        [
            (sf[b] + (g.preflag * _pretab(b) if b < N_SFB else 0))
            if b < N_SFB
            else 0
            for b in range(22)
        ],
        dtype=np.float64,
    )
    gains = 2.0 ** ((g.global_gain - 210) / 4.0 - mult * sf_arr[BAND_OF_LINE])
    ax = np.abs(xr) / gains
    return (np.sign(xr) * np.round(np.power(ax, 0.75))).astype(np.int64)


def _short_gains(g: GranuleInfo, sf: list[list[int]]) -> np.ndarray:
    """Per-TRANSMITTED-position gain for short blocks:
    2^((gg - 210 - 8*subblock_gain[w]) / 4) * 2^(-mult * sf[w][b])."""
    mult = (g.scalefac_scale + 1) * 0.5
    sbg = np.array(g.subblock_gain, dtype=np.float64)[SHORT_T_WIN]
    sf_arr = np.array(sf, dtype=np.float64)[SHORT_T_WIN, SHORT_T_BAND]
    return 2.0 ** ((g.global_gain - 210.0 - 8.0 * sbg) / 4.0 - mult * sf_arr)


def requantize_short(
    g: GranuleInfo, sf: list[list[int]], x: np.ndarray
) -> np.ndarray:
    """Transmitted-order codes -> window-major spectral values
    (w*192 + line) via the reorder permutation."""
    vals = np.sign(x) * np.power(np.abs(x).astype(np.float64), 4.0 / 3.0)
    vals *= _short_gains(g, sf)
    out = np.empty(LINES)
    out[SHORT_PERM] = vals
    return out


def quantize_short(
    xr_wm: np.ndarray, g: GranuleInfo, sf: list[list[int]]
) -> np.ndarray:
    """Window-major spectral values -> transmitted-order codes."""
    vals = xr_wm[SHORT_PERM]
    ax = np.abs(vals) / _short_gains(g, sf)
    return (np.sign(vals) * np.round(np.power(ax, 0.75))).astype(np.int64)


# ---------------------------------------------------------------------------
# Alias reduction, MDCT, frequency inversion
# ---------------------------------------------------------------------------

# ISO §2.4.3.4.10.1 butterfly coefficients (spec-mandated constants,
# like CRC polynomials): cs = 1/sqrt(1+ci^2), ca = ci*cs.
_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
_CS = 1.0 / np.sqrt(1.0 + _CI * _CI)
_CA = _CI * _CS


def alias_reduce(xr: np.ndarray, inverse: bool = False) -> np.ndarray:
    """8 butterflies across each of the 31 subband boundaries; the
    butterflies are rotations (cs^2 + ca^2 = 1), so inverse=True (the
    encoder side) is the transpose."""
    out = xr.reshape(SUBBANDS, BLK).copy()
    sign = 1.0 if not inverse else -1.0
    for sb in range(1, SUBBANDS):
        lo = out[sb - 1]
        hi = out[sb]
        for i in range(8):
            a = lo[BLK - 1 - i]
            b = hi[i]
            lo[BLK - 1 - i] = a * _CS[i] + sign * b * _CA[i]
            hi[i] = b * _CS[i] - sign * a * _CA[i]
    return out.reshape(LINES)


_N_MDCT = 36
_WIN = np.sin(np.pi / _N_MDCT * (np.arange(_N_MDCT) + 0.5))
_COS = np.cos(
    np.pi
    / (2 * _N_MDCT)
    * (2 * np.arange(_N_MDCT)[:, None] + 1 + _N_MDCT // 2)
    * (2 * np.arange(BLK)[None, :] + 1)
)


def imdct_block(X: np.ndarray) -> np.ndarray:
    """18 coefficients -> 36 windowed time samples (long block)."""
    return (_COS @ X) * _WIN


def mdct_block(x36: np.ndarray) -> np.ndarray:
    """36 windowed time samples -> 18 coefficients; scaled so that
    imdct + 50%% overlap-add reconstructs exactly (TDAC with the sine
    window — verified in tests to ~1e-12)."""
    return (4.0 / _N_MDCT) * (_COS.T @ (x36 * _WIN))


_N_SHORT = 12
_WIN_S = np.sin(np.pi / _N_SHORT * (np.arange(_N_SHORT) + 0.5))
_COS_S = np.cos(
    np.pi
    / (2 * _N_SHORT)
    * (2 * np.arange(_N_SHORT)[:, None] + 1 + _N_SHORT // 2)
    * (2 * np.arange(6)[None, :] + 1)
)


def imdct_short(X18: np.ndarray) -> np.ndarray:
    """18 coefficients of one subband (3 windows x 6) -> 36 time
    samples: three 12-point IMDCTs overlap-added into the standard
    short-window layout (6 leading / trailing zeros)."""
    out = np.zeros(_N_MDCT)
    for w in range(3):
        y = (_COS_S @ X18[w * 6 : (w + 1) * 6]) * _WIN_S
        out[6 + 6 * w : 18 + 6 * w] += y
    return out


def mdct_short(x36: np.ndarray) -> np.ndarray:
    """Adjoint of :func:`imdct_short` scaled for TDAC: 36 time samples
    -> 18 coefficients (3 windows x 6)."""
    out = np.empty(18)
    for w in range(3):
        seg = x36[6 + 6 * w : 18 + 6 * w]
        out[w * 6 : (w + 1) * 6] = (4.0 / _N_SHORT) * (_COS_S.T @ (seg * _WIN_S))
    return out


def _freq_inversion(blocks: np.ndarray) -> np.ndarray:
    """(18, 32) time x subband: odd subbands negate odd samples (both
    directions — the operation is an involution)."""
    out = blocks.copy()
    out[1::2, 1::2] *= -1.0
    return out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _GranuleSynth:
    """Per-channel IMDCT overlap-add + polyphase state."""

    def __init__(self):
        self.carry = np.zeros((SUBBANDS, BLK))
        self.syn = Synthesizer()

    def granule_to_pcm(self, xr: np.ndarray, short: bool = False) -> np.ndarray:
        """576 spectral values -> 576 PCM samples.  ``short``: xr is in
        window-major layout (w*192 + line), no alias reduction, three
        12-point IMDCTs per subband instead of one 36-point."""
        sb_time = np.empty((BLK, SUBBANDS))  # time x subband
        if short:
            wm = xr.reshape(3, LINES // 3)
            for sb in range(SUBBANDS):
                x18 = wm[:, sb * 6 : (sb + 1) * 6].reshape(-1)
                y = imdct_short(x18)
                sb_time[:, sb] = y[:BLK] + self.carry[sb]
                self.carry[sb] = y[BLK:]
        else:
            xr = alias_reduce(xr)
            spec = xr.reshape(SUBBANDS, BLK)
            for sb in range(SUBBANDS):
                y = imdct_block(spec[sb])
                sb_time[:, sb] = y[:BLK] + self.carry[sb]
                self.carry[sb] = y[BLK:]
        sb_time = _freq_inversion(sb_time)
        out = np.empty(LINES)
        for t in range(BLK):
            out[t * SUBBANDS : (t + 1) * SUBBANDS] = self.syn.push(sb_time[t])
        return out


def decode_layer3_samples(
    b: bytes, pos: int, end: int
) -> tuple[np.ndarray, int]:
    """Decode all Layer III frames of ``b[pos:end]`` (MPEG-1 only).
    Returns (samples, sample_rate) like decode_mpeg_samples."""
    sr = None
    nch = None
    ms_flags: list[bool] = []
    frames: list[tuple[SideInfo, int]] = []  # (side info, main_data offset)
    main_data = bytearray()
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
        if hdr.layer != 3:
            raise Mp3Error("mixed layers in one stream")
        if hdr.version_bits != 3:
            raise Mp3Error("MPEG-2/2.5 Layer III not supported")
        if pos + hdr.frame_bytes > end:
            break
        this_nch = 1 if hdr.channel_mode == "mono" else 2
        if sr is None:
            sr, nch = hdr.sample_rate, this_nch
        elif hdr.sample_rate != sr or this_nch != nch:
            raise Mp3Error("sample rate / channel change mid-stream")
        # joint stereo: mode_extension bit 1 (header bit 5) = MS stereo;
        # intensity (bit 4) is not supported
        hbits = int.from_bytes(b[pos : pos + 4], "big")
        ms = False
        if hdr.channel_mode == "joint_stereo":
            mode_ext = (hbits >> 4) & 0x3
            if mode_ext & 0x1:
                raise Mp3Error("intensity stereo not supported")
            ms = bool(mode_ext & 0x2)
        body = pos + 4 + (2 if hdr.protected else 0)
        br = BitReader(b, body * 8)
        si = parse_side_info(br, this_nch)
        si_end = body + side_info_bytes(this_nch)
        frame_main = b[si_end : pos + hdr.frame_bytes]
        # bit reservoir: this frame's granules start main_data_begin
        # bytes BEFORE the main data accumulated so far
        offset = len(main_data) - si.main_data_begin
        if offset < 0:
            raise Mp3Error("bit reservoir underrun")
        frames.append((si, offset))
        ms_flags.append(ms)
        main_data += frame_main
        pos += hdr.frame_bytes
    if sr is None or not frames:
        raise Mp3Error("no decodable Layer III frame found")

    md = bytes(main_data)
    synths = [_GranuleSynth() for _ in range(nch)]
    out_chunks: list[np.ndarray] = []
    for fi, (si, offset) in enumerate(frames):
        br = BitReader(md, offset * 8)
        prev_sf: list[list[int] | None] = [None] * nch
        for gr in range(GRANULES):
            xr_ch: list[np.ndarray] = []
            shorts: list[bool] = []
            for ch in range(nch):
                g = si.granules[gr][ch]
                short = bool(g.window_switching and g.block_type == 2)
                if g.window_switching and g.block_type != 2:
                    raise Mp3Error(
                        "start/stop transition windows are behind the "
                        "documented Layer III seam (long+short decode)"
                    )
                if short:
                    sf_s, p2bits = _read_scalefacs_short(br, g)
                    x = _read_spectrum(br, g, p2bits)
                    xr_ch.append(requantize_short(g, sf_s, x))
                else:
                    sf, p2bits = _read_scalefacs(
                        br,
                        g,
                        si.scfsi[ch],
                        prev_sf[ch] if gr == 1 else None,
                    )
                    if gr == 0:
                        prev_sf[ch] = sf
                    x = _read_spectrum(br, g, p2bits)
                    xr_ch.append(requantize(g, sf, x))
                shorts.append(short)
            if ms_flags[fi] and nch == 2:
                if shorts[0] != shorts[1]:
                    raise Mp3Error("MS stereo with mixed block types")
                m, s = xr_ch
                xr_ch = [(m + s) / SQRT2, (m - s) / SQRT2]
            for ch in range(nch):
                pcm = synths[ch].granule_to_pcm(
                    xr_ch[ch], short=shorts[ch]
                )
                if nch == 1:
                    out_chunks.append(pcm)
                else:
                    if ch == 0:
                        pair = np.empty((LINES, 2))
                    pair[:, ch] = pcm
                    if ch == nch - 1:
                        out_chunks.append(pair)
    out = np.concatenate(out_chunks, axis=0)
    return out, sr


# ---------------------------------------------------------------------------
# Encoder (deterministic fixture generator, long blocks, no reservoir)
# ---------------------------------------------------------------------------


MAX_GRANULE_BITS = 4095  # part2_3_length is a 12-bit side-info field


def _quantize_once(
    xr: np.ndarray, gg: int, short: bool = False
) -> tuple[GranuleInfo, list | list[list[int]], np.ndarray]:
    """One quantization pass at a fixed global_gain: codes + region
    split + per-region table selection.  ``short``: xr is window-major
    and the codes come out in transmitted (reordered) order."""
    g = GranuleInfo()
    g.global_gain = gg
    if short:
        g.window_switching = 1
        g.block_type = 2
        sf = [[0] * N_SFB_SHORT for _ in range(3)]
        x = quantize_short(xr, g, sf)
    else:
        sf = [0] * N_SFB
        x = quantize(xr, g, sf)
    nz = np.nonzero(x)[0]
    if nz.size == 0:
        g.big_values = 0
        g.table_select = (0, 0, 0)
        g.region0_count = 0
        g.region1_count = 0
        return g, sf, x
    big_idx = np.nonzero(np.abs(x) > 1)[0]
    big_end = int(big_idx[-1]) + 1 if big_idx.size else 0
    if big_end % 2:
        big_end += 1
    g.big_values = big_end // 2
    if g.big_values > 288:
        raise Mp3Error("big_values exceeds 288 pairs")
    # regions 0/1/2 over band edges; pick per-region tables by max
    r0_end, r1_end = _region_boundaries(g)
    ts = [0, 0, 0]
    for ri, (lo, hi) in enumerate(
        ((0, r0_end), (r0_end, r1_end), (r1_end, big_end))
    ):
        seg = np.abs(x[lo:hi])
        ts[ri] = (
            _table_for_max(int(seg.max())) if seg.size and seg.max() else 0
        )
    g.table_select = tuple(ts)
    return g, sf, x


def _encode_granule(
    xr: np.ndarray,
    max_code: int,
    max_bits: int = MAX_GRANULE_BITS,
    short: bool = False,
) -> tuple[GranuleInfo, list | list[list[int]], np.ndarray]:
    """Quantize one granule-channel: the ISO inner ("rate") loop.
    Start from the global_gain that bounds the largest code by
    ``max_code``, then coarsen (gg += 4) until the Huffman-coded
    granule fits ``max_bits`` (the 12-bit part2_3_length ceiling) —
    the structural reason every MP3 encoder has this loop."""
    peak = float(np.max(np.abs(xr))) if xr.size else 0.0
    if peak <= 0:
        return _quantize_once(xr, 210, short)
    # need 2^((gg-210)*3/16) >= peak^(3/4) / max_code
    gg = 210 + math.ceil(
        (16.0 / 3.0) * math.log2(max(peak ** 0.75 / max_code, 2.0 ** -60))
    )
    gg = min(255, max(0, gg))
    while True:
        g, sf, x = _quantize_once(xr, gg, short)
        # scalefac_compress = 0 -> zero scalefactor bits in both modes
        scratch = BitWriter()
        hbits = _write_spectrum(scratch, g, x)
        if hbits <= max_bits:
            return g, sf, x
        if gg >= 255:
            raise Mp3Error("granule does not fit even at coarsest gain")
        gg = min(255, gg + 4)


def encode_layer3(
    pcm: np.ndarray,
    sr: int = 32000,
    max_code: int = 255,
    ms_stereo: bool = False,
    short_blocks: bool = False,
) -> bytes:
    """Deterministic Layer III fixture encoder: PCM -> MPEG-1 Layer III
    stream decodable by :func:`decode_layer3_samples` (same engine
    tables — the self-consistency contract). Long blocks, scalefactors
    zero, no bit reservoir (main_data_begin = 0, each frame padded).

    ``max_code`` bounds the quantized magnitude (quantization SNR knob);
    ``ms_stereo`` encodes (L±R)/sqrt2 with the joint-stereo MS header;
    ``short_blocks`` uses block_type-2 short windows (3 x 12-point
    MDCTs, reordered transmission) for EVERY granule — the fixture for
    the short decode path (a real encoder would switch on transients).
    """
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    nch = pcm.shape[1]
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    if ms_stereo and nch != 2:
        raise ValueError("ms_stereo requires 2 channels")
    spf = GRANULES * LINES  # 1152
    nframes = pcm.shape[0] // spf
    if nframes == 0:
        raise ValueError(f"need at least {spf} samples")

    # fix the bitrate FIRST (the highest the table offers), derive the
    # per-granule-channel bit budget from the frame size, and let the
    # rate loop fit each granule into it — the real encoder structure
    from audio_feature_extraction_spark.multimodal.mpeg import _BITRATES

    kbps = max(_BITRATES[(1, 3)][1:])
    fbytes = _frame_bytes(3, kbps, sr)
    payload_bits = (fbytes - 4 - side_info_bytes(nch)) * 8
    granule_budget = min(MAX_GRANULE_BITS, payload_bits // (GRANULES * nch))

    analyzers = [Analyzer() for _ in range(nch)]
    carry = [np.zeros((SUBBANDS, BLK)) for _ in range(nch)]  # MDCT input lap

    frames_payload: list[bytes] = []
    frames_si: list[SideInfo] = []
    for f in range(nframes):
        si = SideInfo()
        si.scfsi = [[0, 0, 0, 0] for _ in range(nch)]
        si.granules = []
        bw = BitWriter()
        for gr in range(GRANULES):
            # analysis: 576 PCM -> (18, 32) subband blocks per channel
            xr_ch = []
            for ch in range(nch):
                seg = pcm[f * spf + gr * LINES : f * spf + (gr + 1) * LINES, ch]
                blocks = np.stack(
                    [
                        analyzers[ch].push(seg[32 * t : 32 * t + 32])
                        for t in range(BLK)
                    ]
                )  # (18, 32)
                blocks = _freq_inversion(blocks)
                if short_blocks:
                    wm = np.empty(LINES)  # window-major spectral layout
                    for sb in range(SUBBANDS):
                        x36 = np.concatenate([carry[ch][sb], blocks[:, sb]])
                        carry[ch][sb] = blocks[:, sb]
                        c18 = mdct_short(x36)  # (3 windows x 6 coeffs)
                        for w in range(3):
                            wm[
                                w * (LINES // 3) + sb * 6 :
                                w * (LINES // 3) + (sb + 1) * 6
                            ] = c18[w * 6 : (w + 1) * 6]
                    xr_ch.append(wm)
                else:
                    spec = np.empty(LINES)
                    for sb in range(SUBBANDS):
                        x36 = np.concatenate([carry[ch][sb], blocks[:, sb]])
                        carry[ch][sb] = blocks[:, sb]
                        spec[sb * BLK : (sb + 1) * BLK] = mdct_block(x36)
                    xr_ch.append(alias_reduce(spec, inverse=True))
            if ms_stereo:
                l, r = xr_ch
                xr_ch = [(l + r) / SQRT2, (l - r) / SQRT2]
            chs = []
            for ch in range(nch):
                g, sf, x = _encode_granule(
                    xr_ch[ch], max_code, max_bits=granule_budget,
                    short=short_blocks,
                )
                start = len(bw.bits)
                if short_blocks:
                    p2 = _write_scalefacs_short(bw, g, sf)
                else:
                    p2 = _write_scalefacs(bw, g, sf)
                hbits = _write_spectrum(bw, g, x)
                g.part2_3_length = p2 + hbits
                assert len(bw.bits) - start == g.part2_3_length
                chs.append(g)
            si.granules.append(chs)
        frames_si.append(si)
        frames_payload.append(bw.tobytes())

    need = 4 + side_info_bytes(nch) + max(len(p) for p in frames_payload)
    kbps = _pick_bitrate(3, sr, need)
    fbytes = _frame_bytes(3, kbps, sr)
    out = bytearray()
    for si, payload in zip(frames_si, frames_payload):
        hdr = bytearray(_build_header(3, kbps, sr, nch))
        if ms_stereo:
            h = int.from_bytes(hdr, "big")
            h = (h & ~(0x3 << 6)) | (0x1 << 6)   # joint stereo
            h = (h & ~(0x3 << 4)) | (0x2 << 4)   # mode_extension: MS
            hdr = bytearray(h.to_bytes(4, "big"))
        out += hdr
        sbw = BitWriter()
        write_side_info(sbw, si, nch)
        out += sbw.tobytes(pad_to=side_info_bytes(nch))
        out += payload.ljust(fbytes - 4 - side_info_bytes(nch), b"\x00")
    return bytes(out)

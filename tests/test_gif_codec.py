"""GIF codec (operators/gif.py): round trips, an INDEPENDENT
literal-only reference encoder, interlace reassembly, and corruption
guards.

The reference encoder below shares no code with the codec: it emits
ONLY literal codes (never a dictionary reference) with a clear every
200 literals — trivially spec-correct by construction — so the
decoder's LZW (table growth, width handling, sub-block framing) is
validated against a second implementation, not against its own
encoder's conventions.
"""

import struct

import numpy as np
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import gif


def _pack_lsb(codes, width):
    acc = nbits = 0
    out = bytearray()
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


def _reference_gif(gray: np.ndarray, interlace: bool = False) -> bytes:
    """Literal-only GIF89a writer (min code size 8, 9-bit codes, clear
    every 200 literals so the decoder's growing table never forces a
    width bump)."""
    h, w = gray.shape
    clear, eoi = 256, 257
    rows = list(range(h))
    if interlace:
        rows = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
    pixels = b"".join(gray[r].tobytes() for r in rows)
    codes = [clear]
    for i, b in enumerate(pixels):
        if i and i % 200 == 0:
            codes.append(clear)
        codes.append(b)
    codes.append(eoi)
    lzw = _pack_lsb(codes, 9)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += bytes(v for g in range(256) for v in (g, g, g))
    # a comment extension before the image: the decoder must skip it
    out += b"\x21\xfe\x05hello\x00"
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(8)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    out.append(0x3B)
    return bytes(out)


_RNG = np.random.RandomState(11)
_CASES = [
    np.zeros((1, 1), np.uint8),
    np.arange(256, dtype=np.uint8).reshape(16, 16),
    _RNG.randint(0, 256, (64, 16)).astype(np.uint8),
    np.full((5, 300), 42, np.uint8),
    (_RNG.randint(0, 3, (200, 40)) * 100).astype(np.uint8),
]


@pytest.mark.parametrize("i", range(len(_CASES)))
def test_roundtrip(i):
    x = _CASES[i]
    h, w, y = gif.decode_gif(gif.encode_gif(x))
    assert (h, w) == x.shape
    assert (y == x).all()


@pytest.mark.parametrize("i", range(len(_CASES)))
def test_decodes_independent_literal_encoder(i):
    x = _CASES[i]
    h, w, y = gif.decode_gif(_reference_gif(x))
    assert (h, w) == x.shape
    assert (y == x).all()


def test_interlace_reassembly():
    x = _RNG.randint(0, 256, (37, 9)).astype(np.uint8)  # odd dims
    h, w, y = gif.decode_gif(_reference_gif(x, interlace=True))
    assert (h, w) == x.shape
    assert (y == x).all()


def test_palette_channel_is_authoritative():
    """Pixels come from the palette's red channel, not the raw index:
    a reversed palette must invert the values."""
    x = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(gif.encode_gif(x))
    # global palette starts at byte 13, 256 * (r,g,b) identity entries
    pal = bytes(
        v for g in range(255, -1, -1) for v in (g, g, g)
    )
    data[13 : 13 + 768] = pal
    _h, _w, y = gif.decode_gif(bytes(data))
    assert (y == 255 - x).all()


def test_truncation_and_mutation_guards():
    base = gif.encode_gif(_CASES[2])
    for cut in (0, 3, 9, 13, 700, len(base) // 2, len(base) - 2):
        with pytest.raises(ValueError):
            gif.decode_gif(base[:cut])
    for pos in range(0, len(base), 97):
        mut = bytearray(base)
        mut[pos] ^= 0xFF
        try:
            h, w, y = gif.decode_gif(bytes(mut))
            assert 0 < h * w <= 1 << 24  # if it decodes, stay sane
        except ValueError:
            pass  # rejecting is the other legal outcome


def test_bomb_guard():
    huge = bytearray(gif.encode_gif(np.zeros((4, 4), np.uint8)))
    struct.pack_into("<HH", huge, 6, 0xFFFF, 0xFFFF)  # 4G logical screen
    with pytest.raises(ValueError):
        gif.decode_gif(bytes(huge))


def test_no_image_stream():
    data = gif.encode_gif(np.zeros((2, 2), np.uint8))
    # header + palette, straight to trailer
    with pytest.raises(ValueError):
        gif.decode_gif(data[: 13 + 768] + b"\x3b")

"""PNG codec spec tests — decoder evidence independent of the encoder.

Mirrors tests/test_jpeg_codec.py's strategy: hand-constructed spec
streams pin the decoder against ISO/IEC 15948 directly (filter
reconstruction, Adam7 pass geometry, palette expansion), round trips
pin encoder↔decoder consistency, and seeded byte-mutation fuzz pins the
fail-soft contract the mapInPandas lanes rely on.  PNG being lossless,
round trips assert EXACT equality — no tolerance bands anywhere.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import png


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _stream(w, h, color_type, raw, *, interlace=0, plte=None, depth=8):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    body = _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


# --------------------------------------------------------------------------
# hand-built spec streams (decoder-only evidence)
# --------------------------------------------------------------------------


def test_hand_built_filters_gray():
    """One 4x3 grayscale image, one row per nontrivial filter, recon
    computed by hand from spec §9:
      row0 Sub:   filt 10,20,30,40  → 10,30,60,100
      row1 Up:    filt 5,5,5,5      → 15,35,65,105
      row2 Paeth: filt 1,2,3,4      → a/b/c predictor per byte.
    Paeth row: b=up, a=left(recon), c=up-left.
      x0: a=0 b=15 c=0  → p=15 pa=15 pb=0  → pred=b=15 → 16
      x1: a=16 b=35 c=15 → p=36 pa=20 pb=1 pc=21 → pred=35 → 37
      x2: a=37 b=65 c=35 → p=67 pa=30 pb=2 pc=32 → pred=65 → 68
      x3: a=68 b=105 c=65 → p=108 pa=40 pb=3 pc=43 → pred=105 → 109
    """
    raw = bytes(
        [1, 10, 20, 30, 40]
        + [2, 5, 5, 5, 5]
        + [4, 1, 2, 3, 4]
    )
    h, w, px = png.decode_png(_stream(4, 3, 0, raw))
    assert (h, w) == (3, 4)
    expect = np.array(
        [[10, 30, 60, 100], [15, 35, 65, 105], [16, 37, 68, 109]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, expect)


def test_hand_built_average_filter_rgb():
    """Average filter with bpp=3: pred = floor((left + up) / 2); first
    pixel's left is 0.  Row0 filt (Up over zero prev ⇒ recon=filt),
    row1 Average."""
    raw = bytes([2, 100, 110, 120, 10, 20, 30]) + bytes(
        [3, 50, 50, 50, 7, 8, 9]
    )
    # row1 px0: pred = (0 + up)/2 → (50+50, ...) = 100,105,110
    # row1 px1: left = row1 px0 recon, up = 10,20,30
    #   pred = ((100+10)/2, (105+20)/2, (110+30)/2) = 55, 62, 70
    #   recon = 62, 70, 79
    h, w, px = png.decode_png(_stream(2, 2, 2, raw))
    assert (h, w) == (2, 2)
    expect = np.array(
        [[[100, 110, 120], [10, 20, 30]], [[100, 105, 110], [62, 70, 79]]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, expect)


def test_hand_built_adam7_geometry():
    """An 8x8 interlaced gray image whose pass streams carry the pass
    NUMBER as every pixel value (filter 0 rows).  Reassembly must place
    pass k exactly on the spec's (x0, y0, dx, dy) lattice — the
    canonical Adam7 diagram, built here from the spec constants and
    checked cell by cell."""
    sizes = {1: (1, 1), 2: (1, 1), 3: (1, 2), 4: (2, 2), 5: (2, 4), 6: (4, 4), 7: (4, 8)}
    raw = bytearray()
    for k, (hp, wp) in sizes.items():
        for _ in range(hp):
            raw += bytes([0]) + bytes([k] * wp)
    h, w, px = png.decode_png(_stream(8, 8, 0, bytes(raw), interlace=1))
    assert (h, w) == (8, 8)
    expect = np.zeros((8, 8), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    for k, (x0, y0, dx, dy) in enumerate(passes, start=1):
        expect[y0::dy, x0::dx] = k
    assert np.array_equal(px, expect)


def test_hand_built_palette():
    """Color type 3: one row of indices 0,1,2 expands through PLTE to
    RGB; index ≥ palette length must raise."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 2])
    h, w, px = png.decode_png(_stream(3, 1, 3, raw, plte=plte))
    assert (h, w) == (1, 3)
    assert np.array_equal(
        px, np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
    )
    bad = bytes([0, 0, 1, 3])  # index 3, palette has 3 entries
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(_stream(3, 1, 3, bad, plte=plte))


def test_ancillary_chunks_skipped_but_crc_checked():
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = png.encode_png(a)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    text = _chunk(b"tEXt", b"Comment\x00hello")
    spliced = data[:ihdr_end] + text + data[ihdr_end:]
    assert np.array_equal(png.decode_png(spliced)[2], a)
    corrupt = bytearray(spliced)
    corrupt[ihdr_end + 9] ^= 0xFF  # flip a tEXt payload byte, CRC stale
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(corrupt))


def test_multiple_idat_chunks():
    """The spec allows the zlib stream split across any number of IDAT
    chunks; the decoder must stitch them."""
    a = (np.arange(64, dtype=np.uint8) * 3).reshape(8, 8)
    data = png.encode_png(a, filter_mode=0)
    # rebuild with the compressed stream split byte-by-byte
    comp = zlib.compress(bytes(b"".join(
        bytes([0]) + a[y].tobytes() for y in range(8)
    )))
    body = data[8 : 8 + 12 + 13]  # IHDR chunk
    idats = b"".join(_chunk(b"IDAT", comp[i : i + 1]) for i in range(len(comp)))
    stream = b"\x89PNG\r\n\x1a\n" + body + idats + _chunk(b"IEND", b"")
    assert np.array_equal(png.decode_png(stream)[2], a)


# --------------------------------------------------------------------------
# round trips (lossless ⇒ exact)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (8, 8), (13, 5, 3), (4, 7, 4), (9, 2, 2), (64, 16)])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_exact(shape, interlace):
    rng = np.random.default_rng(hash(shape) % (2**32))
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    h, w, px = png.decode_png(png.encode_png(a, interlace=interlace))
    assert (h, w) == a.shape[:2]
    assert np.array_equal(px, a)


def test_adaptive_filter_beats_none_on_gradients():
    g = (np.arange(32)[:, None] + np.arange(48)[None, :]).astype(np.uint8)
    assert len(png.encode_png(g)) < len(png.encode_png(g, filter_mode=0))


def test_bit_determinism():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(17, 9, 3), dtype=np.uint8)
    assert png.encode_png(a) == png.encode_png(a)
    assert png.encode_png(a, interlace=True) == png.encode_png(a, interlace=True)


def test_adaptive_selection_matches_per_row_reference():
    """The r11 vectorized adaptive encoder ((5, h) cost matrix + argmin)
    must pick the SAME filter per scanline as the spec heuristic
    computed row-by-row — first-minimum tie-break included.  Reference
    recomputed here from the raw image exactly as libpng documents
    (min sum of absolute signed residuals)."""
    rng = np.random.default_rng(23)
    for shape, bpp in (((24, 16), 1), ((9, 5, 3), 3), ((7, 4, 2), 2)):
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        # constant rows force cost TIES between Sub/Up/Avg/Paeth —
        # the first-minimum tie-break is what this test pins
        a[shape[0] // 2 :] = a[shape[0] // 2]
        data = png.encode_png(a)
        # pull the filter byte of each scanline back out of the stream
        _, _, px = png.decode_png(data)  # sanity: stream stays valid
        raw = zlib.decompress(
            b"".join(p for t, p in png._walk_chunks(data) if t == b"IDAT")
        )
        stride = a.shape[1] * bpp
        got = [raw[y * (1 + stride)] for y in range(a.shape[0])]
        img = a.reshape(a.shape[0], stride).astype(np.int16)
        prev = np.zeros(stride, dtype=np.int16)
        expect = []
        for y in range(a.shape[0]):
            row, up = img[y], prev
            left = np.zeros(stride, dtype=np.int16)
            left[bpp:] = row[:-bpp]
            ul = np.zeros(stride, dtype=np.int16)
            ul[bpp:] = up[:-bpp]
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            paeth = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            cand = [
                row,
                (row - left) & 0xFF,
                (row - up) & 0xFF,
                (row - ((left + up) >> 1)) & 0xFF,
                (row - paeth) & 0xFF,
            ]
            costs = [int(np.minimum(c, 256 - c).sum()) for c in cand]
            expect.append(min(range(5), key=lambda k: costs[k]))
            prev = row
        assert got == expect, (shape, got, expect)
        assert px.shape[0] == a.shape[0]  # stream decoded above


# --------------------------------------------------------------------------
# hostile containers
# --------------------------------------------------------------------------


def test_rejects_non_png():
    for junk in (b"", b"\x89PNG", b"BMnot a png", b"\xff\xd8\xff\xe0JFIF"):
        with pytest.raises(ValueError):
            png.decode_png(junk)


def test_rejects_bad_header_fields():
    a = np.zeros((2, 2), dtype=np.uint8)
    raw = bytes([0, 0, 0, 0, 0, 0])
    with pytest.raises(NotImplementedError, match="bit depth"):
        png.decode_png(_stream(2, 2, 0, raw, depth=16))
    with pytest.raises(ValueError, match="color type"):
        png.decode_png(_stream(2, 2, 7, raw))
    with pytest.raises(ValueError, match="dimensions"):
        png.decode_png(_stream(0, 2, 0, raw))
    del a


def test_decode_size_guard():
    """Hostile IHDR declaring a huge image must raise before inflating
    anything — the executor-OOM guard, same contract as JPEG's
    MAX_DECODE_PIXELS."""
    raw = bytes([0, 0])
    data = bytearray(_stream(1, 1, 0, raw))
    data[16:24] = struct.pack(">II", 1 << 20, 1 << 20)
    # fix IHDR CRC so the size check (not the CRC check) is what fires
    ihdr = bytes(data[12:16]) + bytes(data[16:29])
    data[29:33] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="dimensions"):
        png.decode_png(bytes(data))


def test_rejects_decompression_bomb():
    """A 1x1 image whose IDAT inflates to megabytes must be rejected by
    the bounded streaming inflate, not materialized."""
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)  # ~10 KB compressed
    with pytest.raises(ValueError, match="exceeds image size"):
        png.decode_png(_stream(1, 1, 0, bomb))


def test_rejects_short_and_overlong_raw():
    with pytest.raises(ValueError, match="expected"):
        png.decode_png(_stream(2, 2, 0, bytes([0, 1, 2])))  # short
    with pytest.raises(ValueError, match="exceeds"):
        png.decode_png(_stream(2, 2, 0, bytes([0, 1, 2, 0, 3, 4, 5, 6, 7])))


def test_rejects_bad_filter_byte():
    raw = bytes([5, 1, 2])
    with pytest.raises(ValueError, match="filter type"):
        png.decode_png(_stream(2, 1, 0, raw))


def test_decoder_fail_soft_under_byte_mutations():
    """Seeded fuzz over sequential AND interlaced streams: single-byte
    mutations must decode or raise ValueError/NotImplementedError —
    never hang, OOM, or leak another exception type (which would abort
    a whole Spark task instead of NULLing one row)."""
    import random

    rng = random.Random(0xB00C)
    base = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    streams = [
        png.encode_png(base),
        png.encode_png(base, interlace=True),
        png.encode_png(np.dstack([base] * 3)),
    ]
    n_ok = n_err = 0
    for _ in range(400):
        enc = streams[rng.randrange(len(streams))]
        i = rng.randrange(len(enc))
        mutated = enc[:i] + bytes([rng.randrange(256)]) + enc[i + 1 :]
        try:
            h, w, px = png.decode_png(mutated)
            assert px.dtype == np.uint8
            n_ok += 1
        except (ValueError, NotImplementedError):
            n_err += 1
    assert n_ok > 0 and n_err > 0


def test_truncation_always_raises():
    enc = png.encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for cut in range(8, len(enc), 7):
        with pytest.raises(ValueError):
            png.decode_png(enc[:cut])

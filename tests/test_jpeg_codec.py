"""operators/jpeg.py — the pure-numpy baseline JPEG codec.

Correctness is pinned two independent ways:

1. HAND-CONSTRUCTED JPEGs (no encoder involved): minimal streams built
   byte-by-byte from the T.81 spec with trivial Huffman tables, whose
   decoded pixels are computable by hand (a DC-only block IDCTs to a
   flat value dc·q/8 + 128).  A decoder bug cannot hide behind a
   matching encoder bug here.
2. Round-trips through the encoder at high quality with tight error
   bounds, plus bit-determinism across calls (the multimodal decode
   lanes hash pixel bytes).
"""

import hashlib
import struct

import numpy as np
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import jpeg


# --------------------------------------------------------------------------
# hand-built minimal streams
# --------------------------------------------------------------------------

def _minimal_gray(w_blocks, entropy, dri=0, q_dc=16):
    """One-component 8×(8·w_blocks) baseline JPEG with trivial tables:
    DC categories 0..3 as the four 2-bit codes, AC table = EOB only."""
    qt = bytes([q_dc] + [1] * 63)  # zigzag order; position 0 is DC
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qt
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8 * w_blocks, 1)
    out += bytes([1, 0x11, 0])
    # DC: 4 codes of length 2 → symbols (categories) 0..3
    out += b"\xff\xc4" + struct.pack(">HB", 19 + 4, 0x00)
    out += bytes([0, 4] + [0] * 14) + bytes([0, 1, 2, 3])
    # AC: 1 code of length 1 → symbol 0x00 (EOB)
    out += b"\xff\xc4" + struct.pack(">HB", 19 + 1, 0x10)
    out += bytes([1] + [0] * 15) + bytes([0x00])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_dc_only_block():
    # DC diff = +2: category 2 → code '10', magnitude bits '10'; EOB '0'
    # bits 10|10|0 + 1-pad → 0b10100111 = 0xA7
    # dequantized DC = 2·16 = 32 → flat block 32/8 + 128 = 132
    h, w, px = jpeg.decode_baseline(_minimal_gray(1, bytes([0xA7])))
    assert (h, w) == (8, 8)
    assert px.dtype == np.uint8
    assert np.all(px == 132)


def test_hand_built_zero_block_is_mid_gray():
    # DC diff = 0: category 0 → code '00'; EOB '0' → 000 + pad 0x1F
    h, w, px = jpeg.decode_baseline(_minimal_gray(1, bytes([0b00011111])))
    assert np.all(px == 128)


def test_hand_built_restart_marker_resets_dc_pred():
    # DRI=1, two MCUs: block1 DC diff +2 (→132); RST0; block2 DC diff -1
    # (category 1 → code '01', magnitude bit '0' = value -1 → pixel
    # -16/8+128 = 126).  Without the predictor reset block2 would decode
    # to dc=1 → 130, not 126.
    b1 = bytes([0b10100111])              # 10|10|0 + pad
    b2 = bytes([0b01001111])              # 01|0|EOB(0) + pad
    data = _minimal_gray(2, b1 + b"\xff\xd0" + b2, dri=1)
    h, w, px = jpeg.decode_baseline(data)
    assert (h, w) == (8, 16)
    assert np.all(px[:, :8] == 132)
    assert np.all(px[:, 8:] == 126)


def test_hand_built_ac_coefficient():
    # DC diff 0 ('00'), then an AC table holding symbol 0x01
    # (run 0, size 1) and EOB.  AC1 value +1 at zigzag position 1
    # (natural (0,1)) with q=1 → f[x,y] = C[0,x]·C[1,y]·1: columns
    # follow the half-cosine, constant down each column.
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] + [1] * 63)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">HB", 23, 0x00)
    out += bytes([0, 4] + [0] * 14) + bytes([0, 1, 2, 3])
    # AC: two codes of length 1? Not canonical — use lengths 1 and 2:
    # '0' → 0x01 (run0,size1), '10' → 0x00 (EOB)
    out += b"\xff\xc4" + struct.pack(">HB", 21, 0x10)
    out += bytes([1, 1] + [0] * 14) + bytes([0x01, 0x00])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    # bits: DC '00', AC sym '0', magnitude '1' (=+1), EOB '10', 1-pad
    # → 00|0|1|10|11 = 0x1B
    out += bytes([0b00011011])
    out += b"\xff\xd9"
    h, w, px = jpeg.decode_baseline(bytes(out))
    basis = [0.4903926402016152, 0.4157348061512726, 0.27778511650980114,
             0.09754516100806417, -0.0975451610080641, -0.277785116509801,
             -0.4157348061512727, -0.4903926402016152]
    expect = np.floor(
        0.35355339059327373 * np.array(basis) + 128.5
    ).astype(np.uint8)
    assert np.array_equal(px, np.tile(expect, (8, 1)))


# --------------------------------------------------------------------------
# hand-built PROGRESSIVE streams (successive approximation + EOB runs)
# --------------------------------------------------------------------------

def _prog_gray(w_blocks, scans, q_dc=16):
    """One-component progressive (SOF2) stream, 8×(8·w_blocks), trivial
    tables (DC categories 0..3 as 2-bit codes; AC: '0'→0x01 run0/size1,
    '10'→0x00 EOB, '110'→0xF0 ZRL, '111'→0x11 run1/size1).  ``scans`` is
    a list of (ss, se, ah, al, entropy_bytes)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([q_dc] + [1] * 63)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8 * w_blocks, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">HB", 23, 0x00)
    out += bytes([0, 4] + [0] * 14) + bytes([0, 1, 2, 3])
    out += b"\xff\xc4" + struct.pack(">HB", 23, 0x10)
    out += bytes([1, 1, 2] + [0] * 13) + bytes([0x01, 0x00, 0xF0, 0x11])
    for ss, se, ah, al, entropy in scans:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_successive_approximation_single_block():
    """Four scans building one block: DC first at Al=1 (diff +3 →
    coef 6), AC first at Al=1 (+1 at zigzag 1 → coef 2), DC refine
    (bit 1 → coef 7), AC refine (correction 1 on the existing coef
    → 3, new −1 at zigzag 2, EOB with remainder corrections)."""
    scans = [
        # DC first, Al=1: cat 2 '10' + bits '11' (=+3) → 10 11 + 1-pad
        (0, 0, 0, 1, bytes([0b10111111])),
        # AC first 1..63, Al=1: sym '0', mag '1' (=+1), EOB '10'
        (1, 63, 0, 1, bytes([0b01101111])),
        # DC refine Ah=1→Al=0: one raw bit = 1 (0xFF would need byte
        # stuffing, so pad with 0111111 instead)
        (0, 0, 1, 0, bytes([0b10111111])),
        # AC refine Ah=1→Al=0: sym '0' (r0 s1), sign bit 0 (−1),
        # correction bit 1 for zigzag-1, place −1 at zigzag 2,
        # then EOB '10' (corrections for the remainder: none nonzero)
        (1, 63, 1, 0, bytes([0b00110111])),
    ]
    h, w, px = jpeg.decode_baseline(_prog_gray(1, scans))
    # final dequantized coefficients (natural order): F[0,0] = 7·16 =
    # 112, F[0,1] = 3 (zigzag 1), F[1,0] = −1 (zigzag 2 → second ROW)
    b0 = 0.35355339059327373
    b1 = np.array([0.4903926402016152, 0.4157348061512726,
                   0.27778511650980114, 0.09754516100806417,
                   -0.0975451610080641, -0.277785116509801,
                   -0.4157348061512727, -0.4903926402016152])
    expect = np.floor(
        112 * b0 * b0
        + 3 * b0 * b1[None, :]      # F[0,1]: varies along columns
        - 1 * b0 * b1[:, None]      # F[1,0]: varies along rows
        + 128.5
    ).astype(np.uint8)
    assert np.array_equal(px, expect)


def test_progressive_eob_run_spans_blocks():
    """An AC-first scan whose single EOB1 symbol (run length 2) must
    terminate BOTH blocks of the image; the DC scan gives them
    different flat levels to prove both still reconstruct.
    AC table for this stream: '0' → 0x10 (EOB1), '10' → 0x00 (EOB)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] + [1] * 63)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 16, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">HB", 23, 0x00)
    out += bytes([0, 4] + [0] * 14) + bytes([0, 1, 2, 3])
    out += b"\xff\xc4" + struct.pack(">HB", 21, 0x10)
    out += bytes([1, 1] + [0] * 14) + bytes([0x10, 0x00])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
    out += bytes([0b10100101])  # DC: +2 then −1
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0])
    # EOB1 '0' + 1 appended bit '0' → run = (1<<1)-1+0 = 1 → this block
    # ends AND the next block is consumed by the pending run
    out += bytes([0b00111111])
    out += b"\xff\xd9"
    h, w, px = jpeg.decode_baseline(bytes(out))
    assert (h, w) == (8, 16)
    assert np.all(px[:, :8] == 132)  # dc=+2 → 2·16/8+128
    assert np.all(px[:, 8:] == 130)  # dc=+2−1=1 → 16/8+128


def test_progressive_matches_sequential_bitexact():
    """Spectral-selection progressive re-encodes the SAME quantized
    coefficients as sequential — decoded pixels must be bit-identical
    across gray/color, 4:4:4/4:2:0, odd dims (incl. the Y-grid padding
    mismatch between interleaved DC and non-interleaved AC scans)."""
    for dims, gray, sub in [
        ((24, 18), False, "444"),
        ((24, 18), False, "420"),
        ((23, 17), True, "444"),
        ((33, 31), False, "420"),
        ((1, 1), True, "444"),
    ]:
        img = _smooth_rgb(*dims)
        if gray:
            img = img[..., 0]
        seq = jpeg.decode_baseline(
            jpeg.encode_baseline(img, 90, subsample=sub)
        )[2]
        prog = jpeg.decode_baseline(
            jpeg.encode_baseline(img, 90, subsample=sub, progressive=True)
        )[2]
        assert np.array_equal(seq, prog), (dims, gray, sub)


# --------------------------------------------------------------------------
# failure modes
# --------------------------------------------------------------------------

def test_rejects_non_jpeg_and_arithmetic():
    with pytest.raises(ValueError):
        jpeg.decode_baseline(b"RIFF1234WAVE")
    # arithmetic coding (SOF9): flip SOF0 → 0xC9 in a real stream —
    # progressive (SOF2) is now SUPPORTED, the honest seam moved here
    data = bytearray(jpeg.encode_baseline(np.zeros((8, 8), dtype=np.uint8)))
    data[data.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        jpeg.decode_baseline(bytes(data))
    # a sequential scan mislabeled SOF2 is malformed, not a crash
    data[data.index(b"\xff\xc9") + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg.decode_baseline(bytes(data))


def test_rejects_truncation():
    data = jpeg.encode_baseline(np.full((16, 16), 77, dtype=np.uint8))
    with pytest.raises((ValueError, IndexError)):
        jpeg.decode_baseline(data[:20])


# --------------------------------------------------------------------------
# encoder round-trips
# --------------------------------------------------------------------------

def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (yy * 5 + 30).clip(0, 255),
            (xx * 6 + 20).clip(0, 255),
            ((yy + xx) * 3 + 50).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("sub,bound", [("444", 4), ("420", 9)])
def test_roundtrip_color_smooth(sub, bound):
    img = _smooth_rgb(24, 18)  # non-multiple-of-8/16 dims
    data = jpeg.encode_baseline(img, quality=95, subsample=sub)
    h, w, out = jpeg.decode_baseline(data)
    assert (h, w, out.shape) == (24, 18, (24, 18, 3))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


def test_roundtrip_gray_flat_exact():
    img = np.full((16, 16), 128, dtype=np.uint8)
    _, _, out = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=90))
    assert np.array_equal(out, img)


def test_quality_monotone_size():
    img = _smooth_rgb(32, 32)
    sizes = [
        len(jpeg.encode_baseline(img, quality=q)) for q in (30, 60, 90)
    ]
    assert sizes == sorted(sizes)


def test_bit_determinism():
    img = _smooth_rgb(17, 23)
    a = jpeg.encode_baseline(img, quality=80, subsample="420")
    b = jpeg.encode_baseline(img, quality=80, subsample="420")
    assert a == b
    da = hashlib.md5(jpeg.decode_baseline(a)[2].tobytes()).hexdigest()
    db = hashlib.md5(jpeg.decode_baseline(b)[2].tobytes()).hexdigest()
    assert da == db


def test_decode_size_guard():
    """A corrupt/hostile SOF header declaring a huge image must raise
    (fail-soft NULL in the lanes), never allocate tens of GB on an
    executor."""
    data = bytearray(jpeg.encode_baseline(np.zeros((8, 8), dtype=np.uint8)))
    i = data.index(b"\xff\xc0")
    data[i + 5 : i + 9] = struct.pack(">HH", 65500, 65500)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        jpeg.decode_baseline(bytes(data))


def test_decoder_fail_soft_under_byte_mutations():
    """Seeded fuzz: single-byte mutations of valid sequential AND
    progressive streams must either decode or raise one of the
    exceptions the mapInPandas lanes catch — never hang, OOM, or leak
    an unexpected exception type (that would abort a whole task at
    scale instead of NULLing one row)."""
    import random

    rng = random.Random(0x5EED)
    img = _smooth_rgb(16, 16)
    streams = [
        jpeg.encode_baseline(img, 80, subsample="420"),
        jpeg.encode_baseline(img, 80, progressive=True),
        jpeg.encode_baseline(img[..., 0], 80),
    ]
    catchable = (ValueError, NotImplementedError, IndexError, struct.error)
    n_ok = n_err = 0
    for _ in range(400):
        enc = streams[rng.randrange(len(streams))]
        i = rng.randrange(len(enc))
        mutated = enc[:i] + bytes([rng.randrange(256)]) + enc[i + 1 :]
        try:
            h, w, px = jpeg.decode_baseline(mutated)
            assert px.dtype == np.uint8
            n_ok += 1
        except catchable:
            n_err += 1
    # both outcomes must occur: all-error would mean the harness is
    # mutating something trivially fatal, all-ok that mutations miss
    assert n_ok > 0 and n_err > 0


def test_one_pixel_image():
    img = np.array([[200]], dtype=np.uint8)
    h, w, out = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=95))
    assert (h, w) == (1, 1)
    assert abs(int(out[0, 0]) - 200) <= 3

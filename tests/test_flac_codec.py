"""FLAC codec contract (operators/flac.py).

Round-trip properties pin the encoder; HAND-BUILT spec streams pin the
decoder paths the encoder never emits (LPC subframes, the three stereo
decorrelation modes, wasted bits, RICE2 and escape residual partitions,
multi-partition residuals); fuzz pins fail-soft (truncation and
mutation must raise, never hang or silently succeed).  Everything here
is written from the public format spec (RFC 9639 / xiph FLAC format).
"""

from __future__ import annotations

import hashlib
import random
import struct

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import flac
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_write,
    encode_flac,
    parse_flac,
)


# ------------------------------------------------------------ helpers


def _streaminfo(rate: int, nch: int, bps: int, total: int, md5=b"\x00" * 16):
    si = bytearray()
    si += struct.pack(">HH", 16, 4096)
    si += b"\x00\x00\x00" * 2
    si += bytes(
        (
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0xF) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF),
        )
    )
    si += struct.pack(">I", total & 0xFFFFFFFF)
    si += md5
    return b"fLaC" + struct.pack(">I", (1 << 31) | 34) + bytes(si)


def _frame(block: int, ch_code: int, body_fn, frame_no: int = 0) -> bytes:
    """Build one frame: header (16-bit end-of-header block size, rate
    and sample size from STREAMINFO), body via ``body_fn(bw)``, CRCs."""
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)  # fixed blocking
    bw.write(7, 4)  # block size: 16-bit at end
    bw.write(0, 4)  # rate: STREAMINFO
    bw.write(ch_code, 4)
    bw.write(0, 3)  # sample size: STREAMINFO
    bw.write(0, 1)
    for b in _utf8_write(frame_no):
        bw.write(b, 8)
    bw.write(block - 1, 16)
    bw.write(_crc8(bytes(bw.out)), 8)
    body_fn(bw)
    bw.align()
    body = bytes(bw.out)
    return body + struct.pack(">H", _crc16(body))


def _verbatim(bw: _BitWriter, samples, bps: int):
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(0, 1)
    for s in samples:
        bw.write(s & ((1 << bps) - 1), bps)


# --------------------------------------------------------- round trip


def test_roundtrip_families():
    rng = random.Random(11)
    sig = [int(8000 * (i % 97) / 97 - 4000) for i in range(9000)]
    for s in (
        [],
        [0],
        [-32768, 32767] * 50,
        [7] * 4096,
        sig,
        [rng.randint(-32768, 32767) for _ in range(5000)],
    ):
        rate, nch, got = parse_flac(encode_flac(s, 22050))
        assert (rate, nch, got) == (22050, 1, s)


def test_encode_compresses_predictable_signals():
    ramp = list(range(-3000, 3000, 3))
    enc = encode_flac(ramp)
    assert len(enc) < 2 * len(ramp) * 0.25  # ≥4x smaller than raw PCM16


def test_streaminfo_md5_guards_the_signal():
    enc = bytearray(encode_flac([100, -200, 300, -400] * 64))
    rate, nch, got = parse_flac(bytes(enc))
    assert got[:2] == [100, -200]
    # flip one residual bit in the frame payload → CRC16 catches it
    enc2 = bytearray(enc)
    enc2[-10] ^= 0x10
    with pytest.raises(ValueError):
        parse_flac(bytes(enc2))
    # zero the CRCs' own bytes too: md5 is the last line of defense —
    # build a stream whose md5 is wrong but CRCs are right
    samples = [1, 2, 3, 4]
    body = _frame(4, 0, lambda bw: _verbatim(bw, samples, 16))
    bad_md5 = hashlib.md5(b"not the signal").digest()
    with pytest.raises(ValueError, match="MD5"):
        parse_flac(_streaminfo(8000, 1, 16, 4, bad_md5) + body)


# ------------------------------------------------- hand-built streams


def test_lpc_subframe_decode():
    """Order-2 LPC with coefs (2,-1), shift 0: s[i] = r + 2s[i-1] -
    s[i-2] — a pure ramp has residual 0 everywhere."""

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)  # LPC order 2 (ty = 0b100001)
        bw.write(0, 1)  # no wasted bits
        for w in (10, 20):
            bw.write(w & 0xFFFF, 16)
        bw.write(3, 4)  # precision 4
        bw.write(0, 5)  # shift 0
        bw.write(2 & 0xF, 4)  # c0 = 2
        bw.write(-1 & 0xF, 4)  # c1 = -1
        bw.write(0, 2)  # RICE
        bw.write(0, 4)  # one partition
        bw.write(0, 4)  # param 0
        for _ in range(6):
            bw.write_unary(0)  # residual 0

    data = _streaminfo(8000, 1, 16, 8) + _frame(8, 0, body)
    assert parse_flac(data)[2] == [10, 20, 30, 40, 50, 60, 70, 80]


def test_lpc_shift_is_arithmetic():
    """Shift 1 with coef 3: s[i] = r + (3*s[i-1] >> 1) — negative
    accumulators must floor-shift (Python >>), not truncate."""

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + 0, 6)  # LPC order 1
        bw.write(0, 1)
        bw.write(-5 & 0xFFFF, 16)  # warmup
        bw.write(3, 4)  # precision 4
        bw.write(1, 5)  # shift 1
        bw.write(3, 4)  # c0 = 3
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(0, 4)
        for _ in range(3):
            bw.write_unary(0)

    data = _streaminfo(8000, 1, 16, 4) + _frame(4, 0, body)
    # s1 = (3*-5)>>1 = -8; s2 = (3*-8)>>1 = -12; s3 = (3*-12)>>1 = -18
    assert parse_flac(data)[2] == [-5, -8, -12, -18]


@pytest.mark.parametrize(
    "ch_code", [8, 9, 10], ids=["left-side", "right-side", "mid-side"]
)
def test_stereo_decorrelation_modes(ch_code):
    left = [100, 200, -300, 32000]
    right = [60, 180, -220, -12345]
    side = [a - b for a, b in zip(left, right)]
    mid = [(a + b) >> 1 for a, b in zip(left, right)]

    def body(bw):
        if ch_code == 8:  # left + side(17-bit)
            _verbatim(bw, left, 16)
            _verbatim(bw, side, 17)
        elif ch_code == 9:  # side(17-bit) + right
            _verbatim(bw, side, 17)
            _verbatim(bw, right, 16)
        else:  # mid + side(17-bit)
            _verbatim(bw, mid, 16)
            _verbatim(bw, side, 17)

    data = _streaminfo(44100, 2, 16, 4) + _frame(4, ch_code, body)
    rate, nch, got = parse_flac(data)
    assert (rate, nch) == (44100, 2)
    want = [v for pair in zip(left, right) for v in pair]
    assert got == want


def test_wasted_bits_shift():
    """CONSTANT subframe, 2 wasted bits: stored value 25 → sample 100."""

    def body(bw):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(1)  # unary 1 → wasted = 2
        bw.write(25 & 0x3FFF, 14)  # bps 16 - 2

    data = _streaminfo(8000, 1, 16, 4) + _frame(4, 0, body)
    assert parse_flac(data)[2] == [100, 100, 100, 100]


def test_rice2_and_escape_partitions():
    """Partition order 1 (two partitions), RICE2 method: partition 0
    rice-coded with a 5-bit param, partition 1 escaped to 7-bit raw."""
    p0 = [3, -4, 0, 5]  # after the order-0 predictor these ARE samples
    p1 = [-63, 62, -1, 17]

    def body(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(1, 2)  # RICE2
        bw.write(1, 4)  # partition order 1
        bw.write(2, 5)  # partition 0: param 2
        for r in p0:
            v = (abs(r) << 1) - (1 if r < 0 else 0)
            bw.write_unary(v >> 2)
            bw.write(v & 3, 2)
        bw.write(31, 5)  # partition 1: escape
        bw.write(7, 5)  # raw width 7
        for r in p1:
            bw.write(r & 0x7F, 7)

    data = _streaminfo(8000, 1, 16, 8) + _frame(8, 0, body)
    assert parse_flac(data)[2] == p0 + p1


def test_fixed_orders_3_and_4_decode():
    """The encoder stops at order 2; the decoder must run the full
    cascade.  Cubic signal → order-3 residuals are constant 6·a."""
    sig = [i**3 for i in range(10)]  # third difference = 6

    def body(bw):
        bw.write(0, 1)
        bw.write(8 + 3, 6)  # FIXED order 3
        bw.write(0, 1)
        for w in sig[:3]:
            bw.write(w & 0xFFFF, 16)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(3, 4)  # param 3
        for _ in range(7):
            v = 6 << 1  # residual 6, zigzag 12
            bw.write_unary(v >> 3)
            bw.write(v & 7, 3)

    data = _streaminfo(8000, 1, 16, 10) + _frame(10, 0, body)
    assert parse_flac(data)[2] == sig


def test_multi_frame_streams_and_frame_numbers():
    s = list(range(-2000, 2000))  # fills one block awkwardly
    enc = encode_flac(s)
    assert parse_flac(enc)[2] == s
    # two hand frames back to back
    f0 = _frame(4, 0, lambda bw: _verbatim(bw, [1, 2, 3, 4], 16), 0)
    f1 = _frame(4, 0, lambda bw: _verbatim(bw, [5, 6, 7, 8], 16), 1)
    data = _streaminfo(8000, 1, 16, 8) + f0 + f1
    assert parse_flac(data)[2] == [1, 2, 3, 4, 5, 6, 7, 8]


# ---------------------------------------------------------------- fuzz


def test_truncation_always_raises():
    enc = encode_flac([i * 37 % 501 - 250 for i in range(700)])
    for cut in list(range(0, 42)) + list(range(42, len(enc), 13)):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_flac(enc[:cut])


def test_mutation_never_hangs_or_lies():
    """Every single-byte corruption either raises or still yields the
    exact original signal (mutations in skipped padding are benign) —
    never a silently WRONG signal (CRC-8/16 + MD5 triple gate)."""
    src = [i * 91 % 1001 - 500 for i in range(300)]
    enc = encode_flac(src)
    rng = random.Random(3)
    for _ in range(200):
        i = rng.randrange(len(enc))
        mut = bytearray(enc)
        mut[i] ^= 1 << rng.randrange(8)
        try:
            _, _, got = parse_flac(bytes(mut))
        except (ValueError, NotImplementedError):
            continue
        assert got == src, f"byte {i}: silent corruption"


def test_rejects_non_flac():
    for junk in (b"", b"RIFF0000WAVE", b"fLaC", b"fLaC" + b"\x00" * 10):
        with pytest.raises(ValueError):
            parse_flac(junk)

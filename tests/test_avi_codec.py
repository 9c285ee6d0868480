"""AVI container walker (operators/avi.py): round trips, an
INDEPENDENT byte-literal container, RIFF padding/JUNK discipline,
truncation + mutation guards, and the ffmpeg hand-off seams.

The hand-assembled container below shares no code with the writer —
every header byte is a spec literal — so the parser is validated
against the RIFF AVI layout itself, not against its own writer's
conventions (the GIF-codec test discipline).
"""

import struct

import numpy as np
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import avi, jpeg


def _frames(n, seed=7):
    rng = np.random.default_rng(seed)
    return [bytes(rng.integers(0, 256, 40, dtype=np.uint8)) for _ in range(n)]


def test_roundtrip_mjpg_chunks():
    frames = _frames(5)
    blob = avi.avi_container(frames, 16, 8, "MJPG")
    w, h, codec, out = avi.parse_avi(blob)
    assert (w, h, codec) == (16, 8, "MJPG")
    assert out == frames


def test_roundtrip_without_junk_and_even_sizes():
    frames = [b"\x01\x02", b"\x03\x04\x05\x06"]
    blob = avi.avi_container(frames, 4, 2, "MJPG", junk=False)
    assert avi.parse_avi(blob)[3] == frames


def test_odd_sized_frames_pad_correctly():
    """Odd chunk sizes force the RIFF pad byte; a walker that counts
    the pad inside the declared size desyncs on frame 2."""
    frames = [b"\xaa" * 7, b"\xbb" * 9, b"\xcc" * 3]
    blob = avi.avi_container(frames, 2, 2, "MJPG")
    assert avi.parse_avi(blob)[3] == frames


def test_dib_frame_flip_and_padding():
    top = bytes(range(36))  # W6 H2 → row 18, stride 20
    packed = avi.dib_frame(top, 6, 2)
    assert len(packed) == 40
    # bottom-up: packed row 0 is top-down row 1
    assert packed[:18] == top[18:]
    assert packed[18:20] == b"\x00\x00"
    assert avi.parse_dib_frame(packed, 6, 2) == top


def test_roundtrip_dib_stream():
    tops = [bytes(range(36)), bytes(range(36, 72))]
    frames = [avi.dib_frame(t, 6, 2) for t in tops]
    blob = avi.avi_container(frames, 6, 2, "DIB ")
    w, h, codec, out = avi.parse_avi(blob)
    assert (w, h, codec) == (6, 2, "DIB ")
    assert [avi.parse_dib_frame(f, 6, 2) for f in out] == tops


def _literal_avi() -> tuple[bytes, list[bytes]]:
    """Hand-assembled single-stream DIB AVI, every byte from the spec:
    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    00db×2) idx1), with an odd-sized JUNK between hdrl and movi."""
    fr0 = avi.dib_frame(bytes(range(36)), 6, 2)
    fr1 = avi.dib_frame(bytes(range(100, 136)), 6, 2)

    def ck(fcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    avih = struct.pack("<14I", 40000, 1000, 0, 0x10, 2, 0, 1, 40, 6, 2,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHH", 0, 0, 0)
            + struct.pack("<6I", 0, 1, 25, 0, 2, 40)
            + struct.pack("<ii", -1, 0) + struct.pack("<4H", 0, 0, 6, 2))
    strf = struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 24, 0, 40, 0, 0, 0, 0)
    hdrl = ck(b"LIST", b"hdrl" + ck(b"avih", avih)
              + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf)))
    movi = ck(b"LIST", b"movi" + ck(b"00db", fr0) + ck(b"00db", fr1))
    idx = ck(b"idx1", struct.pack("<4sIII", b"00db", 0x10, 4, 40)
             + struct.pack("<4sIII", b"00db", 0x10, 52, 40))
    body = hdrl + ck(b"JUNK", b"\x00" * 5) + movi + idx
    return ck(b"RIFF", b"AVI " + body), [fr0, fr1]


def test_parses_independent_literal_container():
    blob, frames = _literal_avi()
    w, h, codec, out = avi.parse_avi(blob)
    assert (w, h, codec) == (6, 2, "DIB ")
    assert out == frames


def test_unsupported_handler_is_ffmpeg_seam():
    frames = _frames(2)
    blob = avi.avi_container(frames, 16, 8, "MJPG")
    xvid = blob.replace(b"MJPG", b"XVID")
    with pytest.raises(NotImplementedError):
        avi.parse_avi(xvid)


def test_palettized_dib_is_ffmpeg_seam():
    blob, _ = _literal_avi()
    # flip biBitCount 24 → 8 inside strf (offset of the <H at +14)
    i = blob.index(b"strf") + 8 + 14
    mutated = blob[:i] + struct.pack("<H", 8) + blob[i + 2:]
    with pytest.raises(NotImplementedError):
        avi.parse_avi(mutated)


def test_strh_frame_count_cross_check():
    blob, _ = _literal_avi()
    # strh dwLength lives at strh payload offset 32
    i = blob.index(b"strh") + 8 + 32
    mutated = blob[:i] + struct.pack("<I", 5) + blob[i + 4:]
    with pytest.raises(ValueError, match="declares 5 frames"):
        avi.parse_avi(mutated)


def test_truncation_guards():
    """Every proper prefix must raise cleanly (ValueError), never hang
    or return silently-short frame lists."""
    blob, _ = _literal_avi()
    for cut in range(0, len(blob) - 1, 7):
        with pytest.raises((ValueError, struct.error)):
            avi.parse_avi(blob[:cut])


def test_header_mutations_raise():
    blob, _ = _literal_avi()
    for repl in ((0, b"RIFX"), (8, b"WAVE")):
        mutated = blob[: repl[0]] + repl[1] + blob[repl[0] + 4:]
        with pytest.raises(ValueError):
            avi.parse_avi(mutated)
    # declared RIFF size beyond the buffer
    oversize = blob[:4] + struct.pack("<I", len(blob) + 100) + blob[8:]
    with pytest.raises(ValueError):
        avi.parse_avi(oversize)


def test_zero_dimension_guard():
    blob, _ = _literal_avi()
    i = blob.index(b"avih") + 8 + 32
    mutated = blob[:i] + struct.pack("<II", 0, 2) + blob[i + 8:]
    with pytest.raises(ValueError, match="dimensions"):
        avi.parse_avi(mutated)


def test_mjpg_frames_decode_with_repo_codec():
    """End-to-end: encode rasters → mux → demux → decode must return
    the decoder's deterministic pixels for each frame independently."""
    rng = np.random.default_rng(3)
    rasters = [rng.integers(0, 256, (8, 16), dtype=np.uint8) for _ in range(3)]
    frames = [jpeg.encode_baseline(r, 90) for r in rasters]
    blob = avi.avi_container(frames, 16, 8, "MJPG")
    _, _, _, out = avi.parse_avi(blob)
    for raster, fr in zip(rasters, out):
        fh, fw, px = jpeg.decode_baseline(fr)
        assert (fh, fw) == (8, 16)
        ref_h, ref_w, ref_px = jpeg.decode_baseline(
            jpeg.encode_baseline(raster, 90)
        )
        assert np.array_equal(px, ref_px)


def test_sample_frames_real_path_demuxes_avi(spark):
    """The r9 real path: AVI payloads demux through the container
    walker (every_nth stride over SOURCE ordinals, raw stream bytes
    out); non-AVI payloads fail soft to one (media_id, -1, NULL) marker
    row instead of killing the task."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import multimodal

    frames = _frames(7, seed=11)
    good = avi.avi_container(frames, 4, 2, "MJPG")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\x00\x00ftypisom not avi"))],
        "media_id long, payload binary",
    )
    out = multimodal.sample_frames(
        df, every_nth=3, max_frames=2, fake_decode=False
    ).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    got = sorted((r.frame_idx, bytes(r.frame_payload)) for r in by_media[1])
    assert got == [(0, frames[0]), (3, frames[3])]
    assert [(r.frame_idx, r.frame_payload) for r in by_media[2]] == [(-1, None)]

"""MP3 (MPEG-1 Layer III) frame walker — pure stdlib, written from the
public ISO/IEC 11172-3 header layout.

MP3 is the most common audio wire format in scraped corpora; the
operation a 100 TB media pipeline actually needs FIRST is not decode
but DEMUX-level accounting — frame count, duration, bitrate profile —
exactly the ``q_avi_framesample`` discipline (walk the container math,
decode nothing).  Full decode (Huffman, IMDCT, synthesis filterbank)
stays a documented seam for a real codec library.

- ``mp3_container(frames, sr_idx, id3_payload=b"")`` — build a real
  MP3 stream: optional ID3v2.4 tag (syncsafe 28-bit size), then one
  4-byte MPEG-1 Layer III header per frame (sync ``0xFFE``, version
  11, layer 01, bitrate/samplerate indices, padding bit) followed by
  exactly the header-mandated payload bytes
  (``144 * bitrate // samplerate + padding - 4``).
- ``walk_mp3(data)`` — skip the ID3v2 tag (syncsafe size), then walk
  frames BY THE HEADER MATH: verify sync/version/layer on every frame,
  reject free-format (index 0) and bad (15) bitrates and the reserved
  samplerate, require a consistent samplerate across frames and an
  exact end-of-stream landing; return per-frame (bitrate_kbps,
  padding) plus the samplerate.  1152 samples per MPEG-1 Layer III
  frame gives exact integer durations.

- ``id3_frames(fields)`` / ``parse_id3(data)`` — ID3v2.4 TEXT frames
  (the metadata layer curation reads: TIT2/TPE1/TALB…): 10-byte frame
  headers with syncsafe sizes, encoding byte 0 (Latin-1) or 3
  (UTF-8), padding tolerated; unknown frame ids are skipped by size
  (the spec's forward-compat rule), non-text frames ignored.

Intentionally NOT implemented (descriptive ValueError seams): audio
DECODE (side info, Huffman spectra, IMDCT), MPEG-2/2.5 low-sample-rate
extensions, Layer I/II, free-format bitrate streams, CRC-protected
frames (protection bit 0), ID3v1 trailing tags, ID3v2.2/2.3 tag
versions, compressed/encrypted/unsynchronised ID3 frames.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table, kbps, index 1..14 (0=free, 15=bad)
BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
SAMPLERATES = (44100, 48000, 32000, None)  # index 3 reserved
SAMPLES_PER_FRAME = 1152


def frame_len(bitrate_kbps: int, samplerate: int, padding: int) -> int:
    """ISO 11172-3 Layer III frame size, header included."""
    return 144 * bitrate_kbps * 1000 // samplerate + padding


def _header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    # sync(11)=all 1 | version(2)=11 MPEG1 | layer(2)=01 III | prot(1)=1
    b1 = 0xFF
    b2 = 0b11111011
    b3 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b4 = 0b01000100  # joint stereo, no copyright, original, no emphasis
    return bytes((b1, b2, b3, b4))


def mp3_container(
    frames: list[tuple[int, int]], sr_idx: int, id3_payload: bytes = b""
) -> bytes:
    """Build an MP3 stream from (bitrate_idx, padding) frame specs at
    one samplerate; payload bytes are a deterministic ramp."""
    sr = SAMPLERATES[sr_idx]
    if sr is None:
        raise ValueError("reserved samplerate index")
    out = bytearray()
    if id3_payload:
        n = len(id3_payload)
        if n >= 1 << 28:
            raise ValueError("ID3v2 payload exceeds the syncsafe size field")
        size = bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F))
        out += b"ID3\x04\x00\x00" + size + id3_payload
    for bidx, pad in frames:
        kbps = BITRATES[bidx]
        if kbps is None:
            raise ValueError(f"unsupported bitrate index {bidx}")
        n = frame_len(kbps, sr, pad)
        out += _header(bidx, sr_idx, pad)
        out += bytes((i * 7 + bidx) & 0xFF for i in range(n - 4))
    return bytes(out)


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("value exceeds the syncsafe size field")
    return bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F))


def _unsyncsafe(b: bytes, what: str) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError(f"{what} size bytes are not syncsafe")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def id3_frames(fields: dict[str, str], utf8: bool = False) -> bytes:
    """Serialize ID3v2.4 text frames (id → value) into a tag PAYLOAD
    (pass to ``mp3_container(..., id3_payload=...)``).  Encoding byte
    0 (Latin-1) by default, 3 (UTF-8) with ``utf8``."""
    out = bytearray()
    for fid, val in fields.items():
        if len(fid) != 4 or not fid.startswith("T"):
            raise ValueError(f"only 4-char T*** text frame ids supported: {fid!r}")
        body = (b"\x03" + val.encode("utf-8")) if utf8 else (
            b"\x00" + val.encode("latin-1")
        )
        out += fid.encode("ascii") + _syncsafe(len(body)) + b"\x00\x00" + body
    return bytes(out)


def parse_id3(data: bytes) -> dict[str, str]:
    """Parse an ID3v2.4 tag (the full 'ID3...' block) → {frame id:
    text} for T*** frames; other frames skipped by size, zero padding
    tolerated.  Raises ValueError on framing violations."""
    if data[:3] != b"ID3":
        raise ValueError("not an ID3v2 tag")
    if data[3] != 4:
        raise ValueError("only ID3v2.4 tags supported")
    if data[5] & 0x80:
        raise ValueError("unsynchronised ID3 tags not supported")
    size = _unsyncsafe(data[6:10], "ID3v2 tag")
    if 10 + size > len(data):
        raise ValueError("ID3v2 tag overruns the stream")
    out: dict[str, str] = {}
    pos, end = 10, 10 + size
    while pos < end:
        if data[pos] == 0:  # padding — zero bytes to the end of the tag
            break
        fid = data[pos : pos + 4]
        if len(fid) < 4 or not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError(f"malformed ID3 frame id at byte {pos}")
        fsize = _unsyncsafe(data[pos + 4 : pos + 8], "ID3 frame")
        flags = data[pos + 8 : pos + 10]
        body_at = pos + 10
        if body_at + fsize > end:
            raise ValueError(f"ID3 frame {fid.decode()} overruns the tag")
        if flags[1] & 0x0C:
            raise ValueError("compressed/encrypted ID3 frames not supported")
        if fid.startswith(b"T") and fsize >= 1:
            body = data[body_at : body_at + fsize]
            enc, text = body[0], body[1:].split(b"\x00")[0]
            if enc == 0:
                out[fid.decode()] = text.decode("latin-1")
            elif enc == 3:
                out[fid.decode()] = text.decode("utf-8")
            else:
                raise ValueError(
                    "only Latin-1 (0) and UTF-8 (3) ID3 text encodings supported"
                )
        pos = body_at + fsize
    return out


def walk_mp3(data: bytes) -> tuple[int, list[tuple[int, int]]]:
    """Walk an MP3 stream → (samplerate, [(bitrate_kbps, padding)]).
    Raises ValueError on any framing violation — never a silent
    partial walk."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        size_bytes = data[6:10]
        if any(b & 0x80 for b in size_bytes):
            raise ValueError("ID3v2 size bytes are not syncsafe")
        pos = 10 + (
            (size_bytes[0] << 21)
            | (size_bytes[1] << 14)
            | (size_bytes[2] << 7)
            | size_bytes[3]
        )
        if pos > len(data):
            raise ValueError("ID3v2 tag overruns the stream")
    frames: list[tuple[int, int]] = []
    sr = None
    while pos < len(data):
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError(f"truncated frame header at byte {pos}")
        if hdr[0] != 0xFF or (hdr[1] & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (hdr[1] >> 3) & 0x3
        layer = (hdr[1] >> 1) & 0x3
        if version != 0b11:
            raise ValueError("only MPEG-1 streams supported (no 2/2.5 extensions)")
        if layer != 0b01:
            raise ValueError("only Layer III streams supported")
        if not hdr[1] & 0x1:
            raise ValueError("CRC-protected frames not supported")
        bidx = hdr[2] >> 4
        kbps = BITRATES[bidx]
        if kbps is None:
            raise ValueError(
                "free-format (0) and bad (15) bitrate indices not supported"
            )
        sr_idx = (hdr[2] >> 2) & 0x3
        this_sr = SAMPLERATES[sr_idx]
        if this_sr is None:
            raise ValueError("reserved samplerate index")
        if sr is None:
            sr = this_sr
        elif sr != this_sr:
            raise ValueError("samplerate changes mid-stream")
        pad = (hdr[2] >> 1) & 0x1
        n = frame_len(kbps, sr, pad)
        if pos + n > len(data):
            raise ValueError(f"frame at byte {pos} overruns the stream")
        frames.append((kbps, pad))
        pos += n
    if sr is None:
        raise ValueError("no MPEG frames in stream")
    return sr, frames

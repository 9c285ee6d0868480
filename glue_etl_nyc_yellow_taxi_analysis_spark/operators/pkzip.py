"""ZIP (PKZIP APPNOTE.TXT) shard walker — pure stdlib struct + zlib,
written from the public format spec.

ZIP is the other archive format sample shards ship in (Kaggle-style
corpora, office-document containers) — the central-directory layout is
what makes members independently seekable, so the read side a 100 TB
ingest meets is "find EOCD, walk the central directory, slice + verify
each member" — the tar/WARC discipline applied to the random-access
archive.  Deliberately small surface:

- ``zip_container(members, method=...)`` — build a shard from
  (name, payload) pairs: local file headers, CRC-32s, central
  directory, end-of-central-directory record.  ``method`` per archive:
  ``"stored"`` (0) or ``"deflate"`` (8, raw zlib wbits=-15).
  Deterministic (fixed DOS timestamp).
- ``parse_zip(data)`` — walk a shard → ordered [(name, payload)] by
  central-directory order.  Verifies EOCD bookkeeping, local-header /
  central-directory agreement (name, method, sizes), CRC-32 of every
  decompressed payload; raises ValueError on truncation/corruption —
  never a silent partial read.

Intentionally NOT implemented (the stdlib ``zipfile`` swap seam):
ZIP64, encryption, data descriptors (bit 3), multi-disk archives,
compression methods beyond stored/deflate — a shard BUILDER controls
its own framing, so these are read-side gaps only for foreign
archives, and each raises a descriptive ValueError at the exact
hand-off point.
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = b"PK\x03\x04"
_CDIR_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
# fixed DOS timestamp for determinism (2021-01-01 00:00:00)
_DOS_DATE = ((2021 - 1980) << 9) | (1 << 5) | 1
_DOS_TIME = 0

_METHODS = {"stored": 0, "deflate": 8}


def zip_container(
    members: list[tuple[str, bytes]],
    method: str = "stored",
    methods: list[str] | None = None,
) -> bytes:
    """Build a deterministic ZIP shard from (name, payload) pairs.
    ``methods`` overrides the compression per member (EPUB's OCF spec
    requires the ``mimetype`` member FIRST and STORED while the rest
    may deflate)."""
    per_member = methods if methods is not None else [method] * len(members)
    if len(per_member) != len(members):
        raise ValueError("methods must match members 1:1")
    for mm in per_member:
        if mm not in _METHODS:
            raise ValueError(f"unsupported method {mm!r}")
    out = bytearray()
    central = bytearray()
    for (name, payload), mname in zip(members, per_member):
        m = _METHODS[mname]
        nb = name.encode("utf-8")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if m == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(payload) + co.flush()
        else:
            data = payload
        offset = len(out)
        common = struct.pack(
            "<HHHHHIII",
            20,  # version needed
            0,  # flags
            m,
            _DOS_TIME,
            _DOS_DATE,
            crc,
            len(data),
            len(payload),
        )
        out += _LOCAL_SIG + common + struct.pack("<HH", len(nb), 0) + nb + data
        central += (
            _CDIR_SIG
            + struct.pack("<H", 20)  # version made by
            + common
            + struct.pack("<HHHHHII", len(nb), 0, 0, 0, 0, 0, offset)
            + nb
        )
    cd_offset = len(out)
    out += central
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(central), cd_offset, 0
    )
    return bytes(out)


def parse_zip(data: bytes) -> list[tuple[str, bytes]]:
    """Walk a ZIP shard → ordered [(name, payload)] (central-directory
    order).  Verifies EOCD bookkeeping, central/local agreement, and
    every payload's CRC-32."""
    if len(data) < 22:
        raise ValueError("too short for an end-of-central-directory record")
    eocd_at = data.rfind(_EOCD_SIG)
    if eocd_at < 0:
        raise ValueError("missing end-of-central-directory record")
    if eocd_at + 22 > len(data):
        raise ValueError("truncated end-of-central-directory record")
    (disk, cd_disk, n_here, n_total, cd_size, cd_offset, comment_len) = struct.unpack(
        "<HHHHIIH", data[eocd_at + 4 : eocd_at + 22]
    )
    if disk or cd_disk:
        raise ValueError("multi-disk archives not supported")
    if eocd_at + 22 + comment_len != len(data):
        raise ValueError("trailing bytes after the EOCD record")
    if n_here != n_total:
        raise ValueError("EOCD entry counts disagree")
    if cd_offset + cd_size != eocd_at:
        raise ValueError("central directory size/offset mismatch")

    members: list[tuple[str, bytes]] = []
    pos = cd_offset
    for _ in range(n_total):
        if pos + 46 > eocd_at:
            raise ValueError("central directory overruns the EOCD record")
        if data[pos : pos + 4] != _CDIR_SIG:
            raise ValueError(f"bad central-directory signature at byte {pos}")
        (
            _ver_made,
            _ver_need,
            flags,
            m,
            _t,
            _d,
            crc,
            csize,
            usize,
            nlen,
            xlen,
            clen,
            _disk,
            _iattr,
            _eattr,
            offset,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", data[pos + 4 : pos + 46])
        if flags & 0x1:
            raise ValueError("encrypted members not supported")
        if flags & 0x8:
            raise ValueError("data-descriptor members not supported")
        name = data[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + xlen + clen
        if pos > eocd_at:
            raise ValueError("central directory overruns the EOCD record")

        if offset + 30 > len(data):
            raise ValueError(f"local header for {name!r} out of range")
        if data[offset : offset + 4] != _LOCAL_SIG:
            raise ValueError(f"bad local-header signature at byte {offset}")
        (_lv, lflags, lm, _lt, _ld, lcrc, lcsize, lusize, lnlen, lxlen) = struct.unpack(
            "<HHHHHIIIHH", data[offset + 4 : offset + 30]
        )
        lname = data[offset + 30 : offset + 30 + lnlen].decode("utf-8")
        if (lname, lm, lcrc, lcsize, lusize) != (name, m, crc, csize, usize):
            raise ValueError(f"local/central header disagreement for {name!r}")
        start = offset + 30 + lnlen + lxlen
        end = start + csize
        if end > len(data):
            raise ValueError(f"truncated member {name!r}")
        raw = data[start:end]
        if m == 0:
            payload = raw
        elif m == 8:
            try:
                d = zlib.decompressobj(-15)
                payload = d.decompress(raw) + d.flush()
            except zlib.error as e:
                raise ValueError(f"bad deflate stream in {name!r}: {e}") from None
            if not d.eof or d.unused_data:
                raise ValueError(f"deflate framing mismatch in {name!r}")
        else:
            raise ValueError(f"compression method {m} not supported")
        if len(payload) != usize:
            raise ValueError(f"size mismatch in {name!r}")
        if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
            raise ValueError(f"CRC-32 mismatch in {name!r}")
        members.append((name, payload))
    return members

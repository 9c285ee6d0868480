"""ZIP (PKZIP APPNOTE.TXT) shard walker — pure stdlib struct + zlib,
written from the public format spec.

ZIP is the other archive format sample shards ship in (Kaggle-style
corpora, office-document containers) — the central-directory layout is
what makes members independently seekable, so the read side a 100 TB
ingest meets is "find EOCD, walk the central directory, slice + verify
each member" — the tar/WARC discipline applied to the random-access
archive.  Deliberately small surface:

- ``zip_container(members, method=..., zip64=...)`` — build a shard
  from (name, payload) pairs: local file headers, CRC-32s, central
  directory, end-of-central-directory record.  ``method`` per archive:
  ``"stored"`` (0) or ``"deflate"`` (8, raw zlib wbits=-15).
  Deterministic (fixed DOS timestamp).  ZIP64 (APPNOTE 4.5) records
  are emitted automatically whenever a size/offset exceeds 4 GiB or
  the member count exceeds 65535 — at 100 TB multi-GiB shard archives
  are routine — and can be FORCED via ``zip64=True`` so the framing is
  testable without 4 GiB fixtures (stdlib ``force_zip64`` precedent).
- ``parse_zip(data)`` — walk a shard → ordered [(name, payload)] by
  central-directory order.  Verifies EOCD bookkeeping (through the
  ZIP64 EOCD locator + record when present), local-header /
  central-directory agreement (name, method, sizes), CRC-32 of every
  decompressed payload; raises ValueError on truncation/corruption —
  never a silent partial read.  0xFFFFFFFF/0xFFFF marker fields
  resolve through the 0x0001 extensible-data extra field in APPNOTE
  order (usize, csize, offset — marked fields only).

Intentionally NOT implemented (the stdlib ``zipfile`` swap seam):
encryption, data descriptors (bit 3), multi-disk archives,
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
_Z64_EOCD_SIG = b"PK\x06\x06"  # ZIP64 end of central directory record
_Z64_LOC_SIG = b"PK\x06\x07"  # ZIP64 EOCD locator (fixed 20 bytes)
_Z64_EXTRA_TAG = 0x0001  # extensible-data field id for ZIP64 values
_U16_MAX = 0xFFFF
_U32_MAX = 0xFFFFFFFF
# fixed DOS timestamp for determinism (2021-01-01 00:00:00)
_DOS_DATE = ((2021 - 1980) << 9) | (1 << 5) | 1
_DOS_TIME = 0

_METHODS = {"stored": 0, "deflate": 8}


def zip_container(
    members: list[tuple[str, bytes]],
    method: str = "stored",
    methods: list[str] | None = None,
    zip64: bool = False,
) -> bytes:
    """Build a deterministic ZIP shard from (name, payload) pairs.
    ``methods`` overrides the compression per member (EPUB's OCF spec
    requires the ``mimetype`` member FIRST and STORED while the rest
    may deflate).  ZIP64 records are emitted automatically when any
    size/offset exceeds 4 GiB or the entry count exceeds 65535;
    ``zip64=True`` forces them regardless (testable framing without
    4 GiB fixtures, like stdlib ``force_zip64``)."""
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
        z64_sizes = zip64 or len(data) > _U32_MAX or len(payload) > _U32_MAX
        z64_offset = zip64 or offset > _U32_MAX
        version = 45 if (z64_sizes or z64_offset) else 20
        # local header: marked sizes resolve through the 0x0001 extra
        # field (APPNOTE 4.5.3: the LOCAL variant carries BOTH sizes)
        if z64_sizes:
            l_extra = struct.pack(
                "<HHQQ", _Z64_EXTRA_TAG, 16, len(payload), len(data)
            )
            l_csize = l_usize = _U32_MAX
        else:
            l_extra = b""
            l_csize, l_usize = len(data), len(payload)
        out += (
            _LOCAL_SIG
            + struct.pack(
                "<HHHHHIII", version, 0, m, _DOS_TIME, _DOS_DATE, crc,
                l_csize, l_usize,
            )
            + struct.pack("<HH", len(nb), len(l_extra))
            + nb
            + l_extra
            + data
        )
        # central entry: the extra field carries marked fields only,
        # in APPNOTE order usize, csize, offset
        z64_vals = []
        c_usize, c_csize, c_off = len(payload), len(data), offset
        if z64_sizes:
            z64_vals += [len(payload), len(data)]
            c_usize = c_csize = _U32_MAX
        if z64_offset:
            z64_vals.append(offset)
            c_off = _U32_MAX
        c_extra = (
            struct.pack(
                f"<HH{len(z64_vals)}Q", _Z64_EXTRA_TAG, 8 * len(z64_vals), *z64_vals
            )
            if z64_vals
            else b""
        )
        central += (
            _CDIR_SIG
            + struct.pack("<H", version)  # version made by
            + struct.pack(
                "<HHHHHIII", version, 0, m, _DOS_TIME, _DOS_DATE, crc,
                c_csize, c_usize,
            )
            + struct.pack("<HHHHHII", len(nb), len(c_extra), 0, 0, 0, 0, c_off)
            + nb
            + c_extra
        )
    cd_offset = len(out)
    out += central
    n, cd_size = len(members), len(central)
    if zip64 or n > _U16_MAX or cd_offset > _U32_MAX or cd_size > _U32_MAX:
        z64_eocd_at = len(out)
        out += _Z64_EOCD_SIG + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0, n, n, cd_size, cd_offset
        )
        out += _Z64_LOC_SIG + struct.pack("<IQI", 0, z64_eocd_at, 1)
        # classic EOCD carries markers; readers resolve via the locator
        n_c, size_c, off_c = (
            min(n, _U16_MAX),
            min(cd_size, _U32_MAX),
            min(cd_offset, _U32_MAX),
        )
    else:
        n_c, size_c, off_c = n, cd_size, cd_offset
    out += _EOCD_SIG + struct.pack("<HHHHIIH", 0, 0, n_c, n_c, size_c, off_c, 0)
    return bytes(out)


def _z64_extra(extra: bytes, name: str) -> bytes:
    """Find the 0x0001 ZIP64 block in an extra field (tag/size walk)."""
    pos = 0
    while pos + 4 <= len(extra):
        tag, size = struct.unpack("<HH", extra[pos : pos + 4])
        if pos + 4 + size > len(extra):
            raise ValueError(f"truncated extra field in {name!r}")
        if tag == _Z64_EXTRA_TAG:
            return extra[pos + 4 : pos + 4 + size]
        pos += 4 + size
    raise ValueError(f"ZIP64 marker without a ZIP64 extra field in {name!r}")


def _z64_take(z64: bytes, at: int, name: str) -> int:
    if at + 8 > len(z64):
        raise ValueError(f"ZIP64 extra field too short in {name!r}")
    return struct.unpack("<Q", z64[at : at + 8])[0]


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
    cd_end = eocd_at
    loc_at = eocd_at - 20
    if loc_at >= 0 and data[loc_at : loc_at + 4] == _Z64_LOC_SIG:
        # ZIP64: the locator points at the ZIP64 EOCD record, whose
        # 64-bit bookkeeping supersedes the (possibly marker) classic
        # fields
        loc_disk, z64_at, loc_ndisks = struct.unpack(
            "<IQI", data[loc_at + 4 : loc_at + 20]
        )
        if loc_disk or loc_ndisks != 1:
            raise ValueError("multi-disk archives not supported")
        if z64_at + 56 > loc_at or data[z64_at : z64_at + 4] != _Z64_EOCD_SIG:
            raise ValueError("ZIP64 EOCD locator points at no ZIP64 EOCD record")
        (_z64_size, _vmade, _vneed, z_disk, z_cd_disk, z_here, z_total,
         z_cd_size, z_cd_offset) = struct.unpack(
            "<QHHIIQQQQ", data[z64_at + 4 : z64_at + 56]
        )
        if z_disk or z_cd_disk:
            raise ValueError("multi-disk archives not supported")
        if z_here != z_total:
            raise ValueError("ZIP64 EOCD entry counts disagree")
        n_total, cd_size, cd_offset = z_total, z_cd_size, z_cd_offset
        cd_end = z64_at
    elif n_total == _U16_MAX or cd_size == _U32_MAX or cd_offset == _U32_MAX:
        raise ValueError("EOCD carries ZIP64 markers but no ZIP64 EOCD locator")
    if cd_offset + cd_size != cd_end:
        raise ValueError("central directory size/offset mismatch")

    members: list[tuple[str, bytes]] = []
    pos = cd_offset
    for _ in range(n_total):
        if pos + 46 > cd_end:
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
        extra = data[pos + 46 + nlen : pos + 46 + nlen + xlen]
        pos += 46 + nlen + xlen + clen
        if pos > cd_end:
            raise ValueError("central directory overruns the EOCD record")
        if _U32_MAX in (usize, csize, offset):
            # marked fields resolve through the ZIP64 extra, APPNOTE
            # order usize, csize, offset (marked fields only)
            z64, zpos = _z64_extra(extra, name), 0
            if usize == _U32_MAX:
                usize, zpos = _z64_take(z64, zpos, name), zpos + 8
            if csize == _U32_MAX:
                csize, zpos = _z64_take(z64, zpos, name), zpos + 8
            if offset == _U32_MAX:
                offset, zpos = _z64_take(z64, zpos, name), zpos + 8

        if offset + 30 > len(data):
            raise ValueError(f"local header for {name!r} out of range")
        if data[offset : offset + 4] != _LOCAL_SIG:
            raise ValueError(f"bad local-header signature at byte {offset}")
        (_lv, lflags, lm, _lt, _ld, lcrc, lcsize, lusize, lnlen, lxlen) = struct.unpack(
            "<HHHHHIIIHH", data[offset + 4 : offset + 30]
        )
        lname = data[offset + 30 : offset + 30 + lnlen].decode("utf-8")
        if _U32_MAX in (lusize, lcsize):
            # local variant carries BOTH sizes (APPNOTE 4.5.3)
            lextra = data[offset + 30 + lnlen : offset + 30 + lnlen + lxlen]
            lz64 = _z64_extra(lextra, name)
            lusize = _z64_take(lz64, 0, name)
            lcsize = _z64_take(lz64, 8, name)
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

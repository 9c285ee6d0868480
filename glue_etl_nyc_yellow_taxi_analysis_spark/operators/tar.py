"""ustar (POSIX.1-1988 tar) shard walker — pure stdlib-struct parsing,
written from the public format spec (pax/ustar header layout).

Training corpora ship as tar shards (the WebDataset convention: one
member per sample, extension = modality), so the read side a 100 TB
ingest meets is "walk 512-byte headers, verify checksums, slice member
payloads" — exactly the RIFF/AVI chunk-walk discipline applied to the
archive layer.  The deliberately small surface:

- ``tar_container(members)`` — build a shard from (name, payload)
  pairs: ustar magic, octal size/chksum fields, 512-byte data padding,
  two-zero-block trailer.  Deterministic (fixed mtime/uid/gid).
- ``parse_tar(data)`` — walk a shard → [(name, payload)].  Verifies
  every header checksum, handles the prefix field, skips non-file
  member types (directories, links, devices, fifos) as ZERO-data
  entries regardless of their size field (hard-link headers from some
  writers store the target's size while writing no blocks), raises
  ValueError on truncation/corruption — never a silent partial read.

Intentionally NOT implemented (the python ``tarfile`` swap seam): GNU
long-name extensions, pax extended headers, sparse members — a shard
BUILDER controls its own names, so ustar's 100-char limit is a
write-side contract, not a read-side gap.
"""

from __future__ import annotations

_BLOCK = 512
_MAGIC = b"ustar\x00" + b"00"


def _octal(v: int, width: int) -> bytes:
    s = f"{v:0{width - 1}o}".encode()
    if len(s) >= width:
        raise ValueError(f"value {v} overflows a {width}-byte octal field")
    return s + b"\x00"


def _header(name: str, size: int) -> bytes:
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError("ustar member names are limited to 100 bytes")
    h = bytearray(_BLOCK)
    h[0 : len(nb)] = nb
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime: fixed for determinism
    h[148:156] = b" " * 8  # chksum computed over spaces
    h[156] = ord("0")  # regular file
    h[257:265] = _MAGIC
    chk = sum(h)
    h[148:155] = f"{chk:06o}".encode() + b"\x00"
    h[155] = ord(" ")
    return bytes(h)


def tar_container(members: list[tuple[str, bytes]]) -> bytes:
    """Build a deterministic ustar shard from (name, payload) pairs."""
    out = bytearray()
    for name, payload in members:
        out += _header(name, len(payload))
        out += payload
        pad = (-len(payload)) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def _field_int(h: bytes, off: int, width: int) -> int:
    raw = h[off : off + width].split(b"\x00", 1)[0].strip(b" \x00")
    if not raw:
        return 0
    try:
        return int(raw, 8)
    except ValueError:
        raise ValueError("malformed octal field in tar header") from None


def parse_tar(data: bytes) -> list[tuple[str, bytes]]:
    """Walk a ustar shard → ordered [(member_name, payload)] for regular
    files.  Verifies each header's checksum (sum of header bytes with
    the chksum field read as spaces); raises ValueError on truncated
    members, bad checksums, or a missing end-of-archive marker."""
    members: list[tuple[str, bytes]] = []
    pos = 0
    while True:
        if pos + _BLOCK > len(data):
            raise ValueError("tar ends without the zero-block trailer")
        h = data[pos : pos + _BLOCK]
        if h == b"\x00" * _BLOCK:  # first of the two trailer blocks
            return members
        stored = _field_int(h, 148, 8)
        computed = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        if stored != computed:
            raise ValueError(f"tar header checksum mismatch at byte {pos}")
        size = _field_int(h, 124, 12)
        name = h[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        if h[257:263] == b"ustar\x00":
            prefix = h[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
            if prefix:
                name = f"{prefix}/{name}"
        typeflag = h[156:157]
        pos += _BLOCK
        # only regular/contiguous files (0, NUL, 7) carry data blocks;
        # link/dir/char/block/fifo entries write NONE, and some foreign
        # writers still store the TARGET's size on hard-link headers —
        # advancing by that size would desync the walk into a checksum
        # error mid-archive, so their size field is ignored here
        data_size = size if typeflag in (b"0", b"\x00", b"7") else 0
        end = pos + data_size
        if end > len(data):
            raise ValueError(f"truncated tar member {name!r}")
        if typeflag in (b"0", b"\x00", b"7"):  # regular/contiguous file
            members.append((name, data[pos:end]))
        pos = end + ((-data_size) % _BLOCK)

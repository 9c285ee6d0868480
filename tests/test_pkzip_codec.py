"""ZIP shard walker contract (operators/pkzip.py): spec-literal layout
(PKZIP APPNOTE.TXT), CRC-32 verification, central/local agreement,
stored + deflate members, and truncation/mutation fuzz.  Cross-checked
against the stdlib ``zipfile`` reader as an independent implementation,
both directions."""

import io
import random
import zipfile

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import pkzip


def _members():
    return [
        ("a.txt", b""),
        ("b.txt", b"x" * 511),
        ("dir/c.txt", bytes(range(256)) * 3),
        ("d.txt", b"the quick brown fox " * 40),  # compressible
    ]


@pytest.mark.parametrize("method", ["stored", "deflate"])
def test_roundtrip(method):
    data = pkzip.zip_container(_members(), method=method)
    assert pkzip.parse_zip(data) == _members()


def test_deflate_actually_compresses():
    st = pkzip.zip_container(_members(), method="stored")
    df = pkzip.zip_container(_members(), method="deflate")
    assert len(df) < len(st)


@pytest.mark.parametrize("method", ["stored", "deflate"])
def test_stdlib_zipfile_reads_our_shards(method):
    data = pkzip.zip_container(_members(), method=method)
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        assert zf.testzip() is None  # stdlib CRC pass
        got = [(i.filename, zf.read(i)) for i in zf.infolist()]
    assert got == _members()


@pytest.mark.parametrize("compression", [zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED])
def test_we_read_stdlib_zipfile_shards(compression):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=compression) as zf:
        for name, payload in _members():
            zf.writestr(name, payload)
    assert pkzip.parse_zip(buf.getvalue()) == _members()


def test_header_is_spec_literal():
    data = pkzip.zip_container([("f.txt", b"AB")])
    assert data[:4] == b"PK\x03\x04"
    assert data[30:35] == b"f.txtAB"[:5]
    eocd = data.rfind(b"PK\x05\x06")
    assert eocd == len(data) - 22
    cd = data.rfind(b"PK\x01\x02")
    assert cd < eocd
    # central directory points back at local header 0
    import struct

    offset = struct.unpack("<I", data[cd + 42 : cd + 46])[0]
    assert offset == 0


def test_truncation_and_mutation_raise_or_preserve_structure():
    members = _members()
    data = pkzip.zip_container(members, method="deflate")
    # any cut breaks EOCD bookkeeping (ZIP ends with the directory)
    for cut in range(1, len(data), 37):
        with pytest.raises(ValueError):
            pkzip.parse_zip(data[:cut])
    rng = random.Random(11)
    survived = 0
    for _ in range(250):
        i = rng.randrange(len(data))
        mut = bytearray(data)
        mut[i] ^= 1 << rng.randrange(8)
        try:
            got = pkzip.parse_zip(bytes(mut))
        except ValueError:
            continue
        survived += 1
        # CRC + header cross-checks: a surviving flip can only live in
        # a zero pad / unused field, never alter names or payloads
        assert got == members
    # survivors live in fields the walker deliberately ignores
    # (version-made-by, timestamps, attributes) — ~15% of a small
    # archive's bytes are such metadata; the structural assertion
    # above is the contract, the bound just catches a dead checker
    assert survived < 80


def test_foreign_features_raise_descriptively():
    data = bytearray(pkzip.zip_container([("f.txt", b"AB")]))
    cd = data.rfind(b"PK\x01\x02")
    data[cd + 8] |= 0x1  # set the encryption bit in the central dir
    with pytest.raises(ValueError, match="encrypted"):
        pkzip.parse_zip(bytes(data))
    with pytest.raises(ValueError, match="method"):
        pkzip.zip_container([("f.txt", b"AB")], method="bzip2")


_MEMBERS = [(f"{i}.txt", f"payload {i} ".encode() * (i + 1)) for i in range(5)]


@pytest.mark.parametrize("method", ["stored", "deflate"])
def test_zip64_forced_roundtrip_and_stdlib_cross_read(method):
    """ZIP64 framing (APPNOTE 4.5): forced via zip64=True so the
    records are exercised without 4 GiB fixtures — marker fields,
    0x0001 extras, ZIP64 EOCD + locator all walk back, and stdlib
    zipfile cross-reads the archive byte-for-byte."""
    data = pkzip.zip_container(_MEMBERS, method=method, zip64=True)
    assert b"PK\x06\x06" in data and b"PK\x06\x07" in data
    assert pkzip.parse_zip(data) == _MEMBERS
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        assert zf.testzip() is None
        assert [(i.filename, zf.read(i.filename)) for i in zf.infolist()] == _MEMBERS


def test_zip64_stdlib_forced_parses():
    """The other direction: stdlib force_zip64 archives (marker local
    sizes resolved through the local 0x0001 extra, classic central
    fields) must walk through parse_zip."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, p in _MEMBERS:
            with zf.open(zipfile.ZipInfo(n), "w", force_zip64=True) as f:
                f.write(p)
    assert pkzip.parse_zip(buf.getvalue()) == _MEMBERS


def test_zip64_markers_without_locator_raise():
    """A classic EOCD carrying ZIP64 marker counts but no locator is a
    corrupt (or unsupported multi-part) archive — loud, not a silent
    65535-member truncation."""
    import struct

    data = bytearray(pkzip.zip_container(_MEMBERS))
    eocd = data.rfind(b"PK\x05\x06")
    data[eocd + 8 : eocd + 12] = struct.pack("<HH", 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="no ZIP64 EOCD locator"):
        pkzip.parse_zip(bytes(data))


def test_zip64_classic_archives_stay_classic():
    """Small archives keep the 20-byte-version classic layout — the
    automatic switch only fires past the 4 GiB / 65535 limits."""
    data = pkzip.zip_container(_MEMBERS)
    assert b"PK\x06\x06" not in data and b"PK\x06\x07" not in data
    assert pkzip.parse_zip(data) == _MEMBERS

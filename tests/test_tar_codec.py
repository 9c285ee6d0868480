"""ustar shard walker contract (operators/tar.py): spec-literal header
layout, checksum verification, prefix reassembly, non-file skipping,
and truncation/mutation fuzz.  Written from the public ustar layout
(POSIX.1-1988); cross-checked against the stdlib ``tarfile`` reader as
an independent implementation."""

import io
import random
import tarfile

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import tar


def test_roundtrip_and_padding():
    members = [
        ("a.txt", b""),
        ("b.txt", b"x" * 511),   # 1 pad byte
        ("c.txt", b"y" * 512),   # exact block
        ("d.txt", b"z" * 513),   # 511 pad bytes
        ("e.txt", bytes(range(256)) * 3),
    ]
    data = tar.tar_container(members)
    assert len(data) % 512 == 0
    assert tar.parse_tar(data) == members


def test_stdlib_tarfile_reads_our_shards():
    """Independent reader: python's tarfile must agree byte for byte."""
    members = [("doc1.txt", b"hello"), ("doc2.txt", b"world" * 100)]
    data = tar.tar_container(members)
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


def test_we_read_stdlib_tarfile_shards():
    """And the converse: shards built by tarfile parse identically."""
    buf = io.BytesIO()
    members = [("x.txt", b"alpha"), ("sub/y.txt", b"beta" * 50)]
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    assert tar.parse_tar(buf.getvalue()) == members


def test_header_is_spec_literal():
    data = tar.tar_container([("f.txt", b"AB")])
    h = data[:512]
    assert h[0:5] == b"f.txt"
    assert h[124:136] == b"00000000002\x00"  # size in octal
    assert h[156] == ord("0")  # regular file
    assert h[257:265] == b"ustar\x0000"
    # checksum: header bytes with the chksum field as spaces
    want = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
    assert int(h[148:155].rstrip(b" \x00"), 8) == want
    assert data[512:514] == b"AB"
    assert data[514:1024] == b"\x00" * 510  # member padding
    assert data[-1024:] == b"\x00" * 1024  # end-of-archive marker


def test_prefix_field_reassembles_long_paths():
    buf = io.BytesIO()
    deep = "p" * 120 + "/q.txt"  # forces the ustar prefix split
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo(deep)
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
    assert tar.parse_tar(buf.getvalue()) == [(deep, b"abc")]


def test_skips_non_file_members():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        f = tarfile.TarInfo("dir/f.txt")
        f.size = 2
        tf.addfile(f, io.BytesIO(b"ok"))
    assert tar.parse_tar(buf.getvalue()) == [("dir/f.txt", b"ok")]


def test_name_limit_and_overflow_guards():
    with pytest.raises(ValueError):
        tar.tar_container([("n" * 101, b"")])
    with pytest.raises(ValueError):
        tar._octal(8**11, 12)


def test_truncation_and_mutation_raise_or_match():
    members = [(f"{i}.txt", bytes([i]) * (i * 37 % 700)) for i in range(9)]
    data = tar.tar_container(members)
    # any cut into real content or the FIRST trailer block must raise;
    # cuts inside the second trailer block leave a complete one-zero-
    # block ending, which real readers (and ours) accept
    for cut in range(0, len(data) - 512, 97):
        with pytest.raises(ValueError):
            tar.parse_tar(data[:cut])
    assert tar.parse_tar(data[:-511]) == members
    rng = random.Random(5)
    for _ in range(150):
        i = rng.randrange(len(data))
        mut = bytearray(data)
        mut[i] ^= 1 << rng.randrange(8)
        try:
            got = tar.parse_tar(bytes(mut))
        except ValueError:
            continue
        # a mutation the checksum can't see lives in member DATA or in
        # the zero padding/trailer — never a silently altered STRUCTURE
        assert [n for n, _ in got] == [n for n, _ in members] or got == []


def test_tar_lane_plan_one_grouping_shuffle(spark, sf_dir):
    """Shard construction is inherently one keyed shuffle on (shard_id,
    doc_id, text); after it, archives stay executor-local — the payload
    column must never cross an Exchange."""
    import re

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES

    from test_plans import _plan

    plan = _plan(QUERIES["q_tar_shard_roundtrip"](spark, sf_dir))
    assert plan.count("+- Exchange") <= 2  # input spread + shard grouping
    for m in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    ):
        assert "payload" not in m.group(1), m.group(1)


def _typed_header(name: str, size: int, typeflag: str) -> bytes:
    """A ustar header with an arbitrary typeflag and the checksum
    recomputed — simulates foreign writers the builder never produces."""
    h = bytearray(tar._header(name, size))
    h[156] = ord(typeflag)
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:155] = f"{chk:06o}".encode() + b"\x00"
    h[155] = ord(" ")
    return bytes(h)


def test_hard_link_with_target_size_writes_no_data():
    """Some foreign writers store the TARGET's size on hard-link entries
    while writing zero data blocks; advancing by that size would desync
    the walk into a mid-archive checksum error (round-9 advice)."""
    archive = (
        _typed_header("ln.txt", 1000, "1")  # hard link, size=target's
        + _typed_header("sym.txt", 512, "2")  # symlink, ditto
        + tar._header("f.txt", 2)
        + b"ok"
        + b"\x00" * 510
        + b"\x00" * 1024
    )
    assert tar.parse_tar(archive) == [("f.txt", b"ok")]


def test_device_and_fifo_members_are_zero_data():
    archive = (
        _typed_header("dev", 64, "3")
        + _typed_header("fifo", 64, "6")
        + b"\x00" * 1024
    )
    assert tar.parse_tar(archive) == []


def test_contiguous_type7_reads_as_regular_file():
    archive = (
        _typed_header("c.txt", 3, "7") + b"abc" + b"\x00" * 509 + b"\x00" * 1024
    )
    assert tar.parse_tar(archive) == [("c.txt", b"abc")]

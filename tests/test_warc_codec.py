"""WARC walker contract (operators/warc.py): spec-literal framing
(ISO 28500 / WARC 1.0), Content-Length verification, per-record gzip
members, HTTP envelope split, and truncation/mutation fuzz.  The gzip
member framing is cross-checked against the stdlib ``gzip`` reader as
an independent implementation."""

import gzip
import random

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import warc


def _records():
    return [
        warc.warcinfo_record("software: test\r\n"),
        warc.response_record(
            "https://example.org/a", warc.http_response(b"<html>a</html>")
        ),
        warc.response_record(
            "https://example.org/b", warc.http_response(b"b" * 700)
        ),
    ]


def test_roundtrip_plain():
    parsed = warc.parse_warc(warc.warc_container(_records()))
    assert [h["warc-type"] for h, _ in parsed] == ["warcinfo", "response", "response"]
    assert parsed[1][0]["warc-target-uri"] == "https://example.org/a"
    status, hh, body = warc.split_http_response(parsed[1][1])
    assert status == "HTTP/1.1 200 OK"
    assert body == b"<html>a</html>"
    assert int(hh["content-length"]) == len(body)


def test_record_is_spec_literal():
    rec = warc.response_record("https://example.org/x", warc.http_response(b"hi"))
    assert rec.startswith(b"WARC/1.0\r\n")
    assert b"\r\nWARC-Type: response\r\n" in rec
    assert rec.endswith(b"\r\n\r\n")
    head, _, rest = rec.partition(b"\r\n\r\n")
    length = int(
        [l for l in head.split(b"\r\n") if l.lower().startswith(b"content-length")][0]
        .split(b":")[1]
    )
    assert rest == rec[len(head) + 4 :]
    assert rest[:length].startswith(b"HTTP/1.1 200 OK")
    assert rest[length:] == b"\r\n\r\n"


def test_record_id_is_deterministic():
    a = warc.response_record("https://example.org/same", b"HTTP/1.1 200 OK\r\n\r\n")
    b = warc.response_record("https://example.org/same", b"HTTP/1.1 200 OK\r\n\r\n")
    assert a == b


def test_gz_members_agree_with_stdlib_gzip():
    """stdlib gzip must see the member concatenation as one stream whose
    payload equals the uncompressed container (independent reader)."""
    recs = _records()
    gz = warc.warc_gz_container(recs)
    assert gzip.decompress(gz) == warc.warc_container(recs)
    assert warc.parse_warc_gz(gz) == warc.parse_warc(warc.warc_container(recs))


def test_gz_one_record_per_member_enforced():
    two_in_one = warc.warc_gz_container([warc.warc_container(_records()[:2])])
    with pytest.raises(ValueError, match="2 records"):
        warc.parse_warc_gz(two_in_one)


def test_truncation_raises_off_record_boundaries():
    """WARC has no end-of-archive marker: a cut at an exact record
    boundary IS a valid shorter archive (fewer records); any other cut
    must raise."""
    recs = _records()
    data = warc.warc_container(recs)
    boundaries, acc = {0}, 0
    for r in recs:
        acc += len(r)
        boundaries.add(acc)
    for cut in range(1, len(data)):
        if cut in boundaries:
            got = warc.parse_warc(data[:cut])
            assert len(got) == sum(1 for b in sorted(boundaries) if 0 < b <= cut)
        else:
            with pytest.raises(ValueError):
                warc.parse_warc(data[:cut])
    # gzip members: same rule at member boundaries; mid-member cuts fail
    gz = warc.warc_gz_container(recs)
    members, pos = set(), 0
    import zlib

    while pos < len(gz):
        d = zlib.decompressobj(31)
        d.decompress(gz[pos:])
        pos = len(gz) - len(d.unused_data)
        members.add(pos)
    for cut in range(1, len(gz)):
        if cut in members:
            assert warc.parse_warc_gz(gz[:cut])
        else:
            with pytest.raises(ValueError):
                warc.parse_warc_gz(gz[:cut])


def test_mutation_never_silently_restructures():
    recs = _records()
    data = warc.warc_container(recs)
    want_names = [h.get("warc-target-uri") for h, _ in warc.parse_warc(data)]
    rng = random.Random(10)
    for _ in range(200):
        i = rng.randrange(len(data))
        mut = bytearray(data)
        mut[i] ^= 1 << rng.randrange(8)
        try:
            got = warc.parse_warc(bytes(mut))
        except ValueError:
            continue
        # a surviving mutation may alter header VALUES or body bytes but
        # never the record COUNT/framing
        assert len(got) == len(recs)
        assert sum(1 for h, _ in got if "content-length" in h) == len(recs)
    # and a flipped bit inside a gzip member always fails the CRC
    gz = warc.warc_gz_container(recs)
    for _ in range(60):
        i = rng.randrange(len(gz))
        mut = bytearray(gz)
        mut[i] ^= 1 << rng.randrange(8)
        try:
            got = warc.parse_warc_gz(bytes(mut))
        except ValueError:
            continue
        assert [h.get("warc-target-uri") for h, _ in got] == want_names


def test_malformed_headers_raise():
    with pytest.raises(ValueError, match="version"):
        warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="colon"):
        warc.parse_warc(b"WARC/1.0\r\nnocolonhere\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
    rec = warc.response_record("https://e.org/x", b"HTTP/1.1 200 OK\r\n\r\nok")
    with pytest.raises(ValueError, match="terminator"):
        warc.parse_warc(rec[:-1] + b"X")
    with pytest.raises(ValueError, match="separator"):
        warc.split_http_response(b"HTTP/1.1 200 OK\r\nno-body")
    with pytest.raises(ValueError, match="status"):
        warc.split_http_response(b"not-http\r\n\r\nbody")

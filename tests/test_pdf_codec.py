"""Subset-PDF codec contract (operators/pdf.py): spec-literal layout
(PDF 1.4 header/xref/trailer), byte-exact xref offsets, /Length and
/Count verification, string-literal escaping, FlateDecode streams, and
truncation/mutation fuzz."""

import random
import re
import zlib

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import pdf


def _pages():
    return [
        ["hello world", "second line here"],
        ["page two only line"],
        ["third page a", "third page b", "third page c"],
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(compress):
    data = pdf.pdf_container(_pages(), compress=compress)
    assert pdf.parse_pdf(data) == [
        "hello world second line here",
        "page two only line",
        "third page a third page b third page c",
    ]


def test_flate_and_plain_extract_identically():
    plain = pdf.parse_pdf(pdf.pdf_container(_pages(), compress=False))
    flate = pdf.parse_pdf(pdf.pdf_container(_pages(), compress=True))
    assert plain == flate
    assert len(pdf.pdf_container(_pages(), compress=True)) != len(
        pdf.pdf_container(_pages(), compress=False)
    )


def test_string_escaping_roundtrips():
    hostile = ["par(en) and \\backslash\\", "tab\there", "new\nline"]
    data = pdf.pdf_container([hostile])
    assert pdf.parse_pdf(data) == [" ".join(hostile)]


def test_octal_escapes_decode():
    # foreign writers emit \ddd octal escapes; our builder never does,
    # but the reader must handle them (spec 7.3.4.2)
    assert pdf._unescape(b"\\101\\170x") == "Axx"
    assert pdf._unescape(b"\\0501\\051") == "(1)"  # \050 = ( , \051 = )
    assert pdf._page_text(b"BT (\\101) Tj (\\x) Tj ET") == "A x"
    with pytest.raises(ValueError, match="dangling"):
        pdf._unescape(b"oops\\")


def test_split_lines_rejoins_exactly():
    text = "the quick brown fox jumps over the lazy dog " * 8
    text = text.strip()
    lines = pdf.split_lines(text, 30)
    assert " ".join(lines) == text
    assert all(len(l) <= 30 or " " not in l for l in lines)


def test_layout_is_spec_literal():
    data = pdf.pdf_container(_pages())
    assert data.startswith(b"%PDF-1.4\n")
    assert data.rstrip().endswith(b"%%EOF")
    xref_at = int(re.search(rb"startxref\s+(\d+)", data).group(1))
    assert data[xref_at : xref_at + 4] == b"xref"
    # every in-use xref offset points at its object header
    section = data[xref_at:]
    n = int(re.search(rb"xref\s+0 (\d+)", section).group(1))
    body = re.search(rb"xref\s+0 \d+\s*\n", section).end()
    for num in range(1, n):
        entry = section[body + 20 * num : body + 20 * num + 20]
        off = int(entry[:10])
        assert data[off:].startswith(f"{num} 0 obj".encode()), num


def test_real_viewer_prerequisites():
    """The invariants every real reader checks before rendering."""
    data = pdf.pdf_container(_pages(), compress=True)
    # /Length matches the exact stream extent for every stream
    for m in re.finditer(rb"/Length (\d+)[^>]*>>\s*\nstream\n", data):
        ln = int(m.group(1))
        assert data[m.end() + ln :].lstrip(b"\r\n").startswith(b"endstream")
    # page /Count == number of kids
    kids = re.search(rb"/Kids \[([^\]]*)\]", data).group(1)
    count = int(re.search(rb"/Count (\d+)", data).group(1))
    assert len(re.findall(rb"R", kids)) == count


def test_truncation_and_mutation_raise_or_preserve_text():
    pages = _pages()
    want = pdf.parse_pdf(pdf.pdf_container(pages, compress=True))
    data = pdf.pdf_container(pages, compress=True)
    for cut in range(1, len(data), 43):
        with pytest.raises(ValueError):
            pdf.parse_pdf(data[:cut])
    rng = random.Random(12)
    for _ in range(250):
        i = rng.randrange(len(data))
        mut = bytearray(data)
        mut[i] ^= 1 << rng.randrange(8)
        try:
            got = pdf.parse_pdf(bytes(mut))
        except ValueError:
            continue
        # a surviving flip may perturb text bytes inside a literal but
        # must never change the page STRUCTURE
        assert len(got) == len(want)


def test_foreign_features_raise_descriptively():
    data = pdf.pdf_container(_pages())
    with pytest.raises(ValueError, match="PDF"):
        pdf.parse_pdf(b"GIF89a not a pdf")
    enc = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    # (trailer grows; startxref still resolves since xref is before it)
    with pytest.raises(ValueError, match="[Ee]ncrypt"):
        pdf.parse_pdf(enc)
    flate = pdf.pdf_container(_pages(), compress=True)
    # same-length filter swap keeps every xref offset valid
    lzw = flate.replace(b"/FlateDecode", b"/LZWDecode  ", 1)
    with pytest.raises(ValueError, match="FlateDecode"):
        pdf.parse_pdf(lzw)


def test_sentinel_words_inside_streams_do_not_truncate():
    """A page whose TEXT contains 'endobj'/'endstream' (or whose flate
    bytes happen to) must round-trip — extents come from /Length, never
    sentinel scanning (r10 hardening)."""
    pages = [["the word endobj appears here", "and endstream too"],
             ["stream endobj endstream xref trailer"]]
    for compress in (False, True):
        got = pdf.parse_pdf(pdf.pdf_container(pages, compress=compress))
        assert got == [
            "the word endobj appears here and endstream too",
            "stream endobj endstream xref trailer",
        ]


def test_non_latin1_text_raises_descriptive_valueerror():
    """The subset codec has no /Encoding machinery beyond Latin-1; a
    multilingual corpus row must hit the documented seam message (and
    remain a ValueError for the fail-soft callers), not a raw
    UnicodeEncodeError traceback (r10 advice)."""
    with pytest.raises(ValueError, match="non-Latin-1 text unsupported"):
        pdf.pdf_container([["naïve ok latin-1", "но не кириллица"]])

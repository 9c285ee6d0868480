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


def _modern(pages=None, compress=True):
    return pdf.pdf_container(pages or _pages(), compress=compress, xref_stream=True)


@pytest.mark.parametrize("compress", [False, True])
def test_xref_stream_roundtrip_matches_classic(compress):
    """PDF 1.5 layout (r11): ObjStm-packed dict objects + a /W [1 4 2]
    big-endian /Predictor 12 cross-reference stream must extract the
    SAME text as the classic-table build — the container flavor is
    invisible to the content."""
    pages = _pages()
    classic = pdf.pdf_container(pages, compress=compress)
    modern = pdf.pdf_container(pages, compress=compress, xref_stream=True)
    assert modern.startswith(b"%PDF-1.5")
    assert b"/Type /XRef" in modern and b"/Type /ObjStm" in modern
    assert b"trailer" not in modern  # the trailer lives in the XRef dict
    assert pdf.parse_pdf(modern) == pdf.parse_pdf(classic)


def test_xref_stream_truncation_and_mutation():
    """The 1.4 hostile battery replayed against the 1.5 layout: every
    truncation raises; a surviving bit-flip never changes the page
    structure."""
    import random as _random

    pages = _pages()
    want = pdf.parse_pdf(_modern(pages))
    data = _modern(pages)
    for cut in range(1, len(data), 43):
        if data[:cut].endswith(b"%%EOF"):
            # stripping only the final newline leaves a VALID pdf
            assert pdf.parse_pdf(data[:cut]) == want
            continue
        with pytest.raises(ValueError):
            pdf.parse_pdf(data[:cut])
    rng = _random.Random(12)
    for _ in range(250):
        i = rng.randrange(len(data))
        mut = bytearray(data)
        mut[i] ^= 1 << rng.randrange(8)
        try:
            got = pdf.parse_pdf(bytes(mut))
        except ValueError:
            continue
        assert len(got) == len(want)


def test_xref_stream_foreign_features_raise():
    """Remaining 1.5+ seams stay loud: /Prev incremental chains,
    /Encrypt in the XRef dict, non-FlateDecode xref filters."""
    data = _modern()
    prev = data.replace(b"/Type /XRef", b"/Type /XRef /Prev 1", 1)
    with pytest.raises(ValueError, match="/Prev"):
        pdf.parse_pdf(prev)
    enc = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R", 1)
    with pytest.raises(ValueError, match="[Ee]ncrypt"):
        pdf.parse_pdf(enc)
    lzw = data.replace(b"/Length", b"/Filter /LZWDecode /Length", 1)
    # first /Length in the file order belongs to a content stream; hit
    # the XREF dict specifically instead
    xz = data.replace(b"/Root 1 0 R /Length", b"/Root 1 0 R /XLength", 1)
    assert xz != data  # the XRef dict carries /Root — replacement fired
    with pytest.raises(ValueError):
        pdf.parse_pdf(xz)


def test_png_unpredict_all_row_tags():
    """parse must undo ANY per-row PNG filter a foreign writer picks
    (we emit Up; Sub/Average/Paeth/None arrive from elsewhere)."""
    rows = [bytes([10, 200, 30, 44, 5, 60, 7]), bytes([1, 2, 3, 4, 5, 6, 7]),
            bytes([250, 251, 0, 9, 9, 9, 9]), bytes([7] * 7), bytes(range(7))]
    cols = 7

    def predict(rows, tags):
        out, prior = bytearray(), bytes(cols)
        for row, tag in zip(rows, tags):
            enc = bytearray([tag])
            for i in range(cols):
                a = row[i - 1] if i else 0
                b = prior[i]
                c = prior[i - 1] if i else 0
                if tag == 0:
                    pred = 0
                elif tag == 1:
                    pred = a
                elif tag == 2:
                    pred = b
                elif tag == 3:
                    pred = (a + b) // 2
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc.append((row[i] - pred) & 0xFF)
            out += enc
            prior = row
        return bytes(out)

    tags = [0, 1, 2, 3, 4]
    assert pdf._png_unpredict(predict(rows, tags), cols) == b"".join(rows)
    with pytest.raises(ValueError, match="row tag"):
        pdf._png_unpredict(predict(rows[:1], [7]), cols)


def test_incremental_append_chain():
    """ISO 32000-1 §7.5.6 incremental updates (r11): the base bytes
    stay byte-identical, appended pages extend the tree, a second
    update chains through TWO /Prev links, and every generation still
    parses standalone."""
    base = pdf.pdf_container([["first page"], ["second page"]], compress=True)
    up1 = pdf.pdf_incremental_append(base, [["third page"], ["fourth page"]])
    assert up1[: len(base)] == base  # append-only
    assert pdf.parse_pdf(up1) == [
        "first page", "second page", "third page", "fourth page",
    ]
    up2 = pdf.pdf_incremental_append(up1, [["fifth page"]], compress=True)
    assert pdf.parse_pdf(up2) == [
        "first page", "second page", "third page", "fourth page", "fifth page",
    ]
    assert pdf.parse_pdf(base) == ["first page", "second page"]
    with pytest.raises(ValueError, match="classic-table bases"):
        pdf.pdf_incremental_append(
            pdf.pdf_container([["x"]], xref_stream=True), [["y"]]
        )


def test_incremental_free_entry_deletes_page():
    """A newer section's 'f' entry must DELETE the object: hand-build
    an update that frees page two's objects and shrinks the tree —
    the merged xref must drop it, not resurrect the older entry."""
    base = pdf.pdf_container([["keep me"], ["delete me"]])
    m = __import__("re").search(rb"startxref\s+(\d+)\s+%%EOF\s*$", base)
    old_xref = int(m.group(1))
    out = bytearray(base)
    new2_at = len(out)
    out += (
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    )
    xref_at = len(out)
    out += b"xref\n2 1\n" + f"{new2_at:010d} 00000 n \n".encode()
    # free page 5 (page object) and 6 (its content stream)
    out += b"5 2\n0000000000 65535 f \n0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size 8 /Root 1 0 R /Prev {old_xref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    assert pdf.parse_pdf(bytes(out)) == ["keep me"]


def test_circular_prev_chain_raises():
    base = pdf.pdf_container(_pages())
    m = __import__("re").search(rb"startxref\s+(\d+)\s+%%EOF\s*$", base)
    old_xref = int(m.group(1))
    # self-referential /Prev: the chain guard must fire, not loop
    loop = base.replace(
        b"/Root 1 0 R >>", f"/Root 1 0 R /Prev {old_xref} >>".encode(), 1
    )
    with pytest.raises(ValueError, match="circular"):
        pdf.parse_pdf(loop)

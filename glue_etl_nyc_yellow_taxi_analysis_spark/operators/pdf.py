"""Subset-PDF codec — pure stdlib struct/zlib, written from the public
PDF 1.4 specification (ISO 32000-1 subset).

Document corpora are full of PDFs; the extraction step a 100 TB text
pipeline meets is "resolve the page tree, decode content streams, pull
the text operators" — the codec discipline (JPEG/FLAC/tar precedent)
applied to the document layer.  The deliberately small surface:

- ``pdf_container(pages, compress=False)`` — build a real PDF: header,
  catalog → page tree → one page object + one content stream per page
  (``BT /F1 12 Tf ... (line) Tj T* ... ET``, PDF-escaped string
  literals, optional ``/Filter /FlateDecode``), a Type1 font object,
  a correct xref table (byte-exact offsets) and trailer.  Builds open
  in real viewers; offsets are verified on the way back in.
- ``parse_pdf(data)`` — walk a PDF → ordered [page text].  Verifies
  the header, startxref/xref bookkeeping (every in-use offset must
  point at its ``N 0 obj``), /Length vs actual stream extent, page
  /Count vs kids, inflates FlateDecode streams, tokenizes BT..ET text
  blocks and unescapes ``Tj`` string literals.  Raises ValueError on
  truncation/corruption — never a silent partial read.

Intentionally NOT implemented (the pdfminer/poppler swap seam, each a
descriptive ValueError at the hand-off): cross-reference STREAMS (PDF
1.5+), incremental updates (multiple xref sections), encryption,
object streams, fonts with custom encodings/CMaps (text extraction
assumes the built-in StandardEncoding our builder emits), TJ array
kerning, and inherited page attributes.
"""

from __future__ import annotations

import re
import zlib

_ESC = {"\\": "\\\\", "(": "\\(", ")": "\\)", "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_UNESC = {"\\": "\\", "(": "(", ")": ")", "n": "\n", "r": "\r", "t": "\t"}


def _escape(s: str) -> str:
    return "".join(_ESC.get(c, c) for c in s)


def _content_stream(lines: list[str]) -> bytes:
    ops = ["BT", "/F1 12 Tf", "14 TL", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("T*")
        ops.append(f"({_escape(line)}) Tj")
    ops.append("ET")
    try:
        return "\n".join(ops).encode("latin-1")
    except UnicodeEncodeError as e:
        # ValueError (not UnicodeEncodeError) so the fail-soft callers'
        # corrupt-payload accounting catches it — the subset codec has
        # no /Encoding machinery beyond PDFDocEncoding's Latin-1 core.
        raise ValueError(
            "non-Latin-1 text unsupported by the subset PDF codec"
        ) from e


def split_lines(text: str, width: int = 60) -> list[str]:
    """Greedy space-boundary line fill: joining the result with single
    spaces reproduces the input exactly (single-spaced input)."""
    words = text.split(" ")
    lines, cur = [], ""
    for w in words:
        if cur and len(cur) + 1 + len(w) > width:
            lines.append(cur)
            cur = w
        else:
            cur = f"{cur} {w}" if cur else w
    lines.append(cur)
    return lines


def pdf_container(pages: list[list[str]], compress: bool = False) -> bytes:
    """Build a PDF; ``pages`` is a list of line-lists (one per page)."""
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            "<< /Type /Pages /Kids ["
            + " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
            + f"] /Count {n_pages} >>"
        ).encode(),
        font_num: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    for i, lines in enumerate(pages):
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {stream_num} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode()
        data = _content_stream(lines)
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objs[stream_num] = head.encode() + b"\nstream\n" + data + b"\nendstream"

    out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")  # binary-sniff comment
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objs) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_XREF_ENTRY = re.compile(rb"^(\d{10}) (\d{5}) ([nf]) ?$")


def _obj_at(data: bytes, offset: int, num: int) -> bytes:
    """Slice a NON-stream object ``num`` at ``offset``, verifying the
    header.  (Stream objects go through ``_stream_at`` — their payload
    bytes may legitimately contain the ``endobj`` sentinel.)"""
    head = f"{num} 0 obj".encode()
    if data[offset : offset + len(head)] != head:
        raise ValueError(f"xref offset for object {num} does not point at it")
    end = data.find(b"endobj", offset)
    if end < 0:
        raise ValueError(f"object {num} has no endobj")
    return data[offset + len(head) : end]


def _stream_at(data: bytes, offset: int, num: int) -> tuple[bytes, bytes]:
    """Slice a STREAM object → (dict bytes, raw stream bytes).  The
    extent comes from /Length, never from sentinel scanning: a content
    stream whose bytes happen to contain ``endobj``/``endstream`` (an
    uncompressed page whose text says "endobj", or any FlateDecode
    output) must not truncate the walk."""
    head = f"{num} 0 obj".encode()
    if data[offset : offset + len(head)] != head:
        raise ValueError(f"xref offset for object {num} does not point at it")
    sm = re.compile(rb"stream\r?\n").search(data, offset)
    eo = data.find(b"endobj", offset)
    if sm is None or (0 <= eo < sm.start()):
        raise ValueError(f"object {num} is not a stream object")
    obj_dict = data[offset + len(head) : sm.start()]
    lm = re.search(rb"/Length\s+(\d+)", obj_dict)
    if not lm:
        raise ValueError(f"stream object {num} missing /Length")
    start = sm.end()
    end = start + int(lm.group(1))
    if end > len(data):
        raise ValueError(f"truncated stream in object {num}")
    if not data[end:].lstrip(b"\r\n").startswith(b"endstream"):
        raise ValueError("/Length disagrees with the stream extent")
    return obj_dict, data[start:end]


def _dict_ref(body: bytes, key: bytes) -> int:
    m = re.search(key + rb"\s+(\d+)\s+0\s+R", body)
    if not m:
        raise ValueError(f"missing {key.decode()} reference")
    return int(m.group(1))


def _unescape(lit: bytes) -> str:
    out, i = [], 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c == b"\\":
            i += 1
            if i >= len(lit):
                raise ValueError("dangling escape in string literal")
            nxt = lit[i : i + 1].decode("latin-1")
            if nxt in _UNESC:
                out.append(_UNESC[nxt])
            elif nxt.isdigit():  # octal escape \ddd
                j = i
                while j < len(lit) and j - i < 3 and chr(lit[j]).isdigit():
                    j += 1
                out.append(chr(int(lit[i:j], 8)))
                i = j - 1
            else:
                out.append(nxt)  # spec: unknown escape = the char itself
        else:
            out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _page_text(stream: bytes) -> str:
    """Tokenize BT..ET blocks; (literal) Tj runs separated per the
    builder's T* line discipline — lines joined with single spaces."""
    texts: list[str] = []
    for block in re.findall(rb"BT(.*?)ET", stream, re.S):
        # (content) Tj — content with escaped parens handled by regex
        for lit in re.findall(rb"\(((?:\\.|[^\\()])*)\)\s*Tj", block, re.S):
            texts.append(_unescape(lit))
    return " ".join(texts)


def parse_pdf(data: bytes) -> list[str]:
    """Walk a PDF → ordered list of page texts (see module docstring
    for the verified subset)."""
    if not data.startswith(b"%PDF-1."):
        raise ValueError("not a PDF (missing %PDF header)")
    tail = data[-64:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("missing startxref/%%EOF trailer")
    xref_at = int(m.group(1))
    if data[xref_at : xref_at + 4] != b"xref":
        if re.match(rb"\d+ \d+ obj", data[xref_at : xref_at + 20] or b""):
            raise ValueError("cross-reference streams (PDF 1.5+) not supported")
        raise ValueError("startxref does not point at an xref table")

    # single xref section: "xref\n0 N\n" + N 20-byte entries
    sec = re.match(rb"xref\s+0 (\d+)\s*\n", data[xref_at:])
    if not sec:
        raise ValueError("unsupported xref sectioning (incremental update?)")
    n_objs = int(sec.group(1))
    pos = xref_at + sec.end()
    offsets: dict[int, int] = {}
    for num in range(n_objs):
        entry = data[pos : pos + 20]
        em = _XREF_ENTRY.match(entry.rstrip(b"\r\n"))
        if not em:
            raise ValueError(f"malformed xref entry for object {num}")
        if em.group(3) == b"n":
            offsets[num] = int(em.group(1))
        pos += 20

    trailer = data[pos : pos + 256]
    tm = re.search(rb"/Root\s+(\d+)\s+0\s+R", trailer)
    if not tm:
        raise ValueError("trailer missing /Root")
    if re.search(rb"/Encrypt", trailer):
        raise ValueError("encrypted PDFs not supported")

    catalog = _obj_at(data, offsets[int(tm.group(1))], int(tm.group(1)))
    pages_num = _dict_ref(catalog, rb"/Pages")
    pages_obj = _obj_at(data, offsets[pages_num], pages_num)
    kids = re.search(rb"/Kids\s*\[([^\]]*)\]", pages_obj)
    cm = re.search(rb"/Count\s+(\d+)", pages_obj)
    if not kids or not cm:
        raise ValueError("page tree missing /Kids or /Count")
    kid_nums = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", kids.group(1))]
    if len(kid_nums) != int(cm.group(1)):
        raise ValueError("/Count disagrees with /Kids")

    texts: list[str] = []
    for kn in kid_nums:
        if kn not in offsets:
            raise ValueError(f"page object {kn} not in xref")
        page = _obj_at(data, offsets[kn], kn)
        sn = _dict_ref(page, rb"/Contents")
        if sn not in offsets:
            raise ValueError(f"content stream {sn} not in xref")
        obj_dict, raw = _stream_at(data, offsets[sn], sn)
        if re.search(rb"/Filter\s*/FlateDecode", obj_dict):
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"bad FlateDecode stream: {e}") from None
        elif re.search(rb"/Filter", obj_dict):
            raise ValueError("only FlateDecode filters are supported")
        texts.append(_page_text(raw))
    return texts

"""Subset-PDF codec — pure stdlib struct/zlib, written from the public
PDF 1.4 specification (ISO 32000-1 subset).

Document corpora are full of PDFs; the extraction step a 100 TB text
pipeline meets is "resolve the page tree, decode content streams, pull
the text operators" — the codec discipline (JPEG/FLAC/tar precedent)
applied to the document layer.  The deliberately small surface:

- ``pdf_container(pages, compress=False, xref_stream=False)`` — build
  a real PDF: header, catalog → page tree → one page object + one
  content stream per page (``BT /F1 12 Tf ... (line) Tj T* ... ET``,
  PDF-escaped string literals, optional ``/Filter /FlateDecode``), a
  Type1 font object, and either a classic xref table + trailer
  (PDF 1.4) or — ``xref_stream=True`` — the MODERN layout every
  PDF 1.5+ writer emits: the non-stream objects packed into one
  ``/Type /ObjStm`` object stream and a ``/Type /XRef``
  cross-reference STREAM (binary ``/W [1 4 2]`` rows, big-endian,
  FlateDecode with the PNG Up predictor ``/Predictor 12`` real
  writers use, trailer keys carried in the stream dict).  Builds open
  in real viewers; offsets are verified on the way back in.
- ``pdf_incremental_append(base, pages)`` — the append-only save
  format (ISO 32000-1 §7.5.6) every editor/signer uses: base bytes
  stay untouched, the page tree is re-written at a new offset, and a
  changed-objects-only xref section chains back via ``/Prev``.
- ``parse_pdf(data)`` — walk a PDF → ordered [page text].  Verifies
  the header, startxref bookkeeping through EITHER flavor (classic
  table with arbitrary subsections, or xref stream: ``/W`` field walk
  over ``/Index`` ranges, PNG row un-predictor for ``/Predictor >=
  10``, type-2 entries resolved through their object stream's
  ``/N``/``/First`` pair header) and through ``/Prev`` incremental
  chains (newest section wins per object; free entries delete;
  circular/implausible chains raise), every in-use offset must point
  at its ``N 0 obj``, /Length vs actual stream extent, page /Count vs
  kids, inflates FlateDecode streams, tokenizes BT..ET text blocks
  and unescapes ``Tj`` string literals.  Raises ValueError on
  truncation/corruption — never a silent partial read.

Intentionally NOT implemented (the pdfminer/poppler swap seam, each a
descriptive ValueError at the hand-off): encryption, fonts with
custom encodings/CMaps (text extraction assumes the built-in
StandardEncoding our builder emits), TJ array kerning, inherited page
attributes, and incremental appends ONTO xref-stream bases (parsing
foreign ones works; producing them would need ObjStm rewriting).
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


_XREF_W = (1, 4, 2)  # type / offset-or-objstm / gen-or-index field widths


def _png_up_predict(rows: list[bytes]) -> bytes:
    """Apply the PNG Up filter (tag 2) row-wise — the /Predictor 12
    form real xref-stream writers emit."""
    out, prior = bytearray(), bytes(len(rows[0])) if rows else b""
    for row in rows:
        out += b"\x02" + bytes((b - p) & 0xFF for b, p in zip(row, prior))
        prior = row
    return bytes(out)


def pdf_container(
    pages: list[list[str]], compress: bool = False, xref_stream: bool = False
) -> bytes:
    """Build a PDF; ``pages`` is a list of line-lists (one per page).
    ``xref_stream=True`` emits the PDF 1.5 layout (object stream +
    cross-reference stream) instead of the classic table."""
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
    stream_nums = []
    for i, lines in enumerate(pages):
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        stream_nums.append(stream_num)
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

    if not xref_stream:
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

    # PDF 1.5 layout: content streams stay top-level (streams may not
    # live inside an ObjStm, ISO 32000-1 §7.5.7); every dict object
    # packs into ONE object stream; bookkeeping goes in an xref STREAM
    objstm_num, xref_num = font_num + 1, font_num + 2
    packed = sorted(n for n in objs if n not in stream_nums)
    out = bytearray(b"%PDF-1.5\n%\xc2\xb5\xc2\xb6\n")
    offsets = {}
    for num in sorted(stream_nums):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    # object stream: "num offset" pair header, then the bodies
    body, pair_parts, at = bytearray(), [], 0
    for num in packed:
        pair_parts.append(f"{num} {at}")
        body += objs[num] + b"\n"
        at = len(body)
    header = (" ".join(pair_parts) + "\n").encode()
    stm_payload = zlib.compress(header + bytes(body), 6)
    offsets[objstm_num] = len(out)
    out += (
        f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(packed)} "
        f"/First {len(header)} /Length {len(stm_payload)} "
        f"/Filter /FlateDecode >>\nstream\n".encode()
        + stm_payload
        + b"\nendstream\nendobj\n"
    )
    # xref stream: one /W [1 4 2] row per object, big-endian; the
    # trailer dict lives in the stream dict itself
    xref_at = len(out)
    n_objs = xref_num + 1
    rows = []
    for num in range(n_objs):
        if num == 0:
            t, f2, f3 = 0, 0, 0xFFFF
        elif num in offsets or num == xref_num:
            t, f2, f3 = 1, offsets.get(num, xref_at), 0
        else:
            t, f2, f3 = 2, objstm_num, packed.index(num)
        rows.append(
            t.to_bytes(_XREF_W[0], "big")
            + f2.to_bytes(_XREF_W[1], "big")
            + f3.to_bytes(_XREF_W[2], "big")
        )
    xdata = zlib.compress(_png_up_predict(rows), 6)
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {n_objs} "
        f"/W [{_XREF_W[0]} {_XREF_W[1]} {_XREF_W[2]}] /Index [0 {n_objs}] "
        f"/Root 1 0 R /Length {len(xdata)} /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns {sum(_XREF_W)} >> "
        f">>\nstream\n".encode()
        + xdata
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def pdf_incremental_append(
    base: bytes, new_pages: list[list[str]], compress: bool = False
) -> bytes:
    """Append pages as an INCREMENTAL UPDATE (ISO 32000-1 §7.5.6 — the
    append-only save every editor/signer uses): the original bytes stay
    byte-identical, new page + content-stream objects follow, the page
    tree object is re-written at a new offset, and a new xref section
    (changed objects only, two subsections) chains to the old one via
    ``/Prev``.  Supports classic-table bases from ``pdf_container``;
    updating an ObjStm-packed base would need ObjStm rewriting, so
    xref-stream bases raise descriptively."""
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF\s*$", base)
    if not m:
        raise ValueError("base is not a parseable PDF (missing trailer)")
    old_xref = int(m.group(1))
    if base[old_xref : old_xref + 4] != b"xref":
        raise ValueError(
            "incremental append supports classic-table bases only "
            "(xref-stream bases would need ObjStm rewriting)"
        )
    sm = re.search(rb"/Size\s+(\d+)", base[old_xref:])
    if not sm:
        raise ValueError("base trailer missing /Size")
    n0 = int(sm.group(1))
    # the LAST 2 0 obj wins: a previously-updated base carries stale
    # page-tree generations earlier in the file (append-only format)
    pm = None
    for pm in re.finditer(rb"\n2 0 obj\n(.*?)\nendobj", base, re.S):
        pass
    if not pm:
        raise ValueError("base page tree (2 0 obj) not found")
    km = re.search(rb"/Kids\s*\[([^\]]*)\]", pm.group(1))
    cm = re.search(rb"/Count\s+(\d+)", pm.group(1))
    fm = re.search(rb"/Font << /F1 (\d+) 0 R >>", base)
    if not km or not cm or not fm:
        raise ValueError("base page tree missing /Kids, /Count, or a font")
    font_num = int(fm.group(1))
    out = bytearray(base)
    if not out.endswith(b"\n"):
        out += b"\n"
    offsets: dict[int, int] = {}
    kid_refs = re.findall(rb"\d+ 0 R", km.group(1))
    for j, lines in enumerate(new_pages):
        page_num, stream_num = n0 + 2 * j, n0 + 2 * j + 1
        data = _content_stream(lines)
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        offsets[stream_num] = len(out)
        out += (
            f"{stream_num} 0 obj\n{head}\nstream\n".encode()
            + data
            + b"\nendstream\nendobj\n"
        )
        offsets[page_num] = len(out)
        out += (
            f"{page_num} 0 obj\n<< /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 612 792] /Contents {stream_num} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>\nendobj\n"
        ).encode()
        kid_refs.append(f"{page_num} 0 R".encode())
    offsets[2] = len(out)
    out += (
        b"2 0 obj\n<< /Type /Pages /Kids ["
        + b" ".join(kid_refs)
        + f"] /Count {int(cm.group(1)) + len(new_pages)} >>\nendobj\n".encode()
    )
    xref_at = len(out)
    n_new = 2 * len(new_pages)
    out += b"xref\n2 1\n" + f"{offsets[2]:010d} 00000 n \n".encode()
    out += f"{n0} {n_new}\n".encode()
    for num in range(n0, n0 + n_new):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n0 + n_new} /Root 1 0 R /Prev {old_xref} >>\n"
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


def _png_unpredict(raw: bytes, columns: int) -> bytes:
    """Undo PNG row predictors (tags 0-4, bpp=1) over ``columns``-wide
    rows — the /Predictor >= 10 form of xref-stream data."""
    stride = columns + 1
    if len(raw) % stride:
        raise ValueError("xref stream data is not a whole number of rows")
    out, prior = bytearray(), bytes(columns)
    for r in range(0, len(raw), stride):
        tag, row = raw[r], bytearray(raw[r + 1 : r + stride])
        for i in range(columns):
            a = row[i - 1] if i else 0
            b = prior[i]
            if tag == 0:
                pred = 0
            elif tag == 1:
                pred = a
            elif tag == 2:
                pred = b
            elif tag == 3:
                pred = (a + b) // 2
            elif tag == 4:
                c = prior[i - 1] if i else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                raise ValueError(f"unknown PNG predictor row tag {tag}")
            row[i] = (row[i] + pred) & 0xFF
        out += row
        prior = bytes(row)
    return bytes(out)


def _xref_stream_entries(data: bytes, xref_at: int, num: int):
    """Parse a /Type /XRef cross-reference stream → (offsets, instream,
    freed, xref dict bytes): type-1 entries land in ``offsets``, type-2
    in ``instream`` as (objstm_num, index), type-0 in ``freed``."""
    obj_dict, raw = _stream_at(data, xref_at, num)
    if not re.search(rb"/Type\s*/XRef", obj_dict):
        raise ValueError("startxref points at a non-XRef stream object")
    wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", obj_dict)
    sm = re.search(rb"/Size\s+(\d+)", obj_dict)
    if not wm or not sm:
        raise ValueError("xref stream missing /W or /Size")
    w = tuple(int(x) for x in wm.groups())
    size = int(sm.group(1))
    if re.search(rb"/Filter\s*/FlateDecode", obj_dict):
        try:
            raw = zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError(f"bad FlateDecode xref stream: {e}") from None
    elif re.search(rb"/Filter", obj_dict):
        raise ValueError("only FlateDecode xref streams are supported")
    pm = re.search(rb"/Predictor\s+(\d+)", obj_dict)
    if pm:
        pred = int(pm.group(1))
        if pred >= 10:
            cm = re.search(rb"/Columns\s+(\d+)", obj_dict)
            columns = int(cm.group(1)) if cm else 1
            if columns != sum(w):
                raise ValueError("/Columns disagrees with /W row width")
            raw = _png_unpredict(raw, columns)
        elif pred != 1:
            raise ValueError(f"unsupported xref predictor {pred}")
    im = re.search(rb"/Index\s*\[([^\]]*)\]", obj_dict)
    idx = (
        [int(x) for x in re.findall(rb"\d+", im.group(1))]
        if im
        else [0, size]
    )
    if len(idx) % 2:
        raise ValueError("odd /Index array in xref stream")
    stride = sum(w)
    n_entries = sum(idx[i + 1] for i in range(0, len(idx), 2))
    if len(raw) < n_entries * stride:
        raise ValueError("xref stream shorter than its /Index claims")
    offsets: dict[int, int] = {}
    instream: dict[int, tuple[int, int]] = {}
    freed: set[int] = set()
    pos = 0
    for i in range(0, len(idx), 2):
        for num_i in range(idx[i], idx[i] + idx[i + 1]):
            fields = []
            for width in w:
                fields.append(
                    int.from_bytes(raw[pos : pos + width], "big") if width else 0
                )
                pos += width
            t = fields[0] if w[0] else 1  # absent type field defaults to 1
            if t == 1:
                offsets[num_i] = fields[1]
            elif t == 2:
                instream[num_i] = (fields[1], fields[2])
            elif t == 0:
                if num_i:  # object 0 is the permanent free-list head
                    freed.add(num_i)
            else:
                raise ValueError(f"unknown xref entry type {t}")
    return offsets, instream, freed, obj_dict


def _classic_section(data: bytes, xref_at: int):
    """Parse one classic xref section (arbitrary subsections, the
    incremental-update form) → (offsets, freed, trailer bytes)."""
    sec = re.match(rb"xref\s*\n", data[xref_at : xref_at + 16])
    if not sec:
        raise ValueError("malformed xref section header")
    pos = xref_at + sec.end()
    offsets: dict[int, int] = {}
    freed: set[int] = set()
    saw_subsection = False
    while True:
        sub = re.match(rb"(\d+) (\d+)\s*\n", data[pos : pos + 32])
        if not sub:
            break
        saw_subsection = True
        start, count = int(sub.group(1)), int(sub.group(2))
        pos += sub.end()
        for num in range(start, start + count):
            entry = data[pos : pos + 20]
            em = _XREF_ENTRY.match(entry.rstrip(b"\r\n"))
            if not em:
                raise ValueError(f"malformed xref entry for object {num}")
            if em.group(3) == b"n":
                offsets[num] = int(em.group(1))
            elif num:  # object 0 is the permanent free-list head
                freed.add(num)
            pos += 20
    if not saw_subsection:
        raise ValueError("xref section has no subsections")
    tm = re.match(rb"\s*trailer\s*", data[pos : pos + 32])
    if not tm:
        raise ValueError("xref section not followed by a trailer")
    # the trailer dict ends at this section's own startxref keyword —
    # slicing past it would read a LATER update's /Prev into this
    # section's trailer (incremental files stack sections)
    end = data.find(b"startxref", pos)
    if end < 0 or end - pos > 512:
        end = pos + 512
    return offsets, freed, data[pos:end]


def parse_pdf(data: bytes) -> list[str]:
    """Walk a PDF → ordered list of page texts (see module docstring
    for the verified subset)."""
    if not data.startswith(b"%PDF-1."):
        raise ValueError("not a PDF (missing %PDF header)")
    tail = data[-64:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("missing startxref/%%EOF trailer")
    # walk the /Prev chain newest-first (incremental updates,
    # ISO 32000-1 §7.5.6); either section flavor may appear at any link
    sections = []
    trailer = b""
    at = int(m.group(1))
    seen_at: set[int] = set()
    while True:
        if at in seen_at:
            raise ValueError("circular /Prev xref chain")
        if len(seen_at) > 64:
            raise ValueError("xref /Prev chain implausibly long")
        seen_at.add(at)
        if data[at : at + 4] == b"xref":
            offs, freed, trail = _classic_section(data, at)
            ins: dict[int, tuple[int, int]] = {}
        else:
            xm = re.match(rb"(\d+) \d+ obj", data[at : at + 20] or b"")
            if not xm:
                raise ValueError(
                    "startxref/Prev points at neither an xref table nor an object"
                )
            offs, ins, freed, trail = _xref_stream_entries(data, at, int(xm.group(1)))
        sections.append((offs, ins, freed))
        if not trailer:
            trailer = trail  # the NEWEST trailer carries /Root
        pm = re.search(rb"/Prev\s+(\d+)", trail)
        if not pm:
            break
        at = int(pm.group(1))
    # merge oldest→newest: a newer section's entries (and frees)
    # override older ones
    offsets: dict[int, int] = {}
    instream: dict[int, tuple[int, int]] = {}
    for offs, ins, freed in reversed(sections):
        for n in freed:
            offsets.pop(n, None)
            instream.pop(n, None)
        for n, v in offs.items():
            offsets[n] = v
            instream.pop(n, None)
        for n, v2 in ins.items():
            instream[n] = v2
            offsets.pop(n, None)

    tm = re.search(rb"/Root\s+(\d+)\s+0\s+R", trailer)
    if not tm:
        raise ValueError("trailer missing /Root")
    if re.search(rb"/Encrypt", trailer):
        raise ValueError("encrypted PDFs not supported")

    objstm_cache: dict[int, tuple[dict[int, bytes], None]] = {}

    def load_objstm(sn: int) -> dict[int, bytes]:
        if sn not in objstm_cache:
            if sn not in offsets:
                raise ValueError(f"object stream {sn} not in xref")
            od, raw = _stream_at(data, offsets[sn], sn)
            if not re.search(rb"/Type\s*/ObjStm", od):
                raise ValueError(f"type-2 entry points into non-ObjStm object {sn}")
            if re.search(rb"/Filter\s*/FlateDecode", od):
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise ValueError(f"bad FlateDecode object stream: {e}") from None
            elif re.search(rb"/Filter", od):
                raise ValueError("only FlateDecode object streams are supported")
            nm = re.search(rb"/N\s+(\d+)", od)
            fm = re.search(rb"/First\s+(\d+)", od)
            if not nm or not fm:
                raise ValueError(f"object stream {sn} missing /N or /First")
            n, first = int(nm.group(1)), int(fm.group(1))
            pairs = [int(x) for x in re.findall(rb"\d+", raw[:first])]
            if len(pairs) < 2 * n:
                raise ValueError(f"object stream {sn} pair header too short")
            bodies: dict[int, bytes] = {}
            for i in range(n):
                onum, ooff = pairs[2 * i], pairs[2 * i + 1]
                oend = pairs[2 * i + 3] if i + 1 < n else len(raw) - first
                bodies[onum] = raw[first + ooff : first + oend]
            objstm_cache[sn] = (bodies, None)
        return objstm_cache[sn][0]

    def get_obj(num: int) -> bytes:
        if num in instream:
            sn, _idx = instream[num]
            bodies = load_objstm(sn)
            if num not in bodies:
                raise ValueError(
                    f"object {num} missing from its object stream {sn}"
                )
            return bodies[num]
        if num not in offsets:
            raise ValueError(f"object {num} not in xref")
        return _obj_at(data, offsets[num], num)

    root_num = int(tm.group(1))
    catalog = get_obj(root_num)
    pages_num = _dict_ref(catalog, rb"/Pages")
    pages_obj = get_obj(pages_num)
    kids = re.search(rb"/Kids\s*\[([^\]]*)\]", pages_obj)
    cm = re.search(rb"/Count\s+(\d+)", pages_obj)
    if not kids or not cm:
        raise ValueError("page tree missing /Kids or /Count")
    kid_nums = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", kids.group(1))]
    if len(kid_nums) != int(cm.group(1)):
        raise ValueError("/Count disagrees with /Kids")

    texts: list[str] = []
    for kn in kid_nums:
        page = get_obj(kn)
        sn = _dict_ref(page, rb"/Contents")
        if sn in instream:
            # ISO 32000-1 §7.5.7: stream objects may not live in an
            # object stream — a type-2 content entry is corruption
            raise ValueError(f"content stream {sn} illegally inside an ObjStm")
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

"""DOCX text extraction — ECMA-376 WordprocessingML over the in-repo
ZIP walker (operators/pkzip.py), pure stdlib.

Office documents are the second-biggest text carrier after HTML/PDF in
a document crawl; a .docx is a ZIP package whose main part
(word/document.xml) holds the text as ``<w:t>`` runs inside ``<w:p>``
paragraphs.  This module COMPOSES the existing codecs: pkzip builds/
walks the package, and the text layer is the same regex-extraction
discipline as operators/html.py.

- ``docx_container(paragraphs)`` — build a minimal valid package:
  [Content_Types].xml, _rels/.rels, word/document.xml with one
  ``<w:p><w:r><w:t>`` run per paragraph, XML-escaped; deflate members.
- ``docx_text(data)`` — walk the ZIP, require the content-type
  declaration and the main part, pull ``<w:t>`` runs per paragraph
  (``xml:space`` honored by never trimming), unescape the XML
  entities.  Raises ValueError on a package without the
  WordprocessingML content type — a renamed xlsx/pptx must fail
  loudly, not extract garbage.

Seam (python-docx swap): styles, tables, headers/footers, footnotes,
tracked changes, and w:tab/w:br whitespace elements are not modeled —
plain body-paragraph text only, the training-corpus shape.
"""

from __future__ import annotations

import re

from . import pkzip

_WML = "application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    f'<Override PartName="/word/document.xml" ContentType="{_WML}"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)

_DOC_HEAD = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:body>"
)
_DOC_TAIL = "</w:body></w:document>"

_XML_ESC = (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"))


def _xml_escape(s: str) -> str:
    for ch, ent in _XML_ESC:
        s = s.replace(ch, ent)
    return s


def _xml_unescape(s: str) -> str:
    for ch, ent in reversed(_XML_ESC):  # &amp; decoded LAST
        s = s.replace(ent, ch)
    return s


def docx_container(paragraphs: list[str]) -> bytes:
    """Build a minimal valid .docx from paragraph strings."""
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(p)}</w:t></w:r></w:p>'
        for p in paragraphs
    )
    doc = _DOC_HEAD + body + _DOC_TAIL
    return pkzip.zip_container(
        [
            ("[Content_Types].xml", _CONTENT_TYPES.encode("utf-8")),
            ("_rels/.rels", _RELS.encode("utf-8")),
            ("word/document.xml", doc.encode("utf-8")),
        ],
        method="deflate",
    )


def docx_text(data: bytes) -> list[str]:
    """Walk a .docx → ordered paragraph texts (w:t runs concatenated
    per w:p).  ValueError on a package that is not WordprocessingML."""
    members = dict(pkzip.parse_zip(data))
    ct = members.get("[Content_Types].xml")
    if ct is None:
        raise ValueError("package missing [Content_Types].xml")
    if _WML.encode() not in ct:
        raise ValueError("not a WordprocessingML package")
    main = members.get("word/document.xml")
    if main is None:
        raise ValueError("package missing word/document.xml")
    xml = main.decode("utf-8")
    paragraphs: list[str] = []
    for p in re.findall(r"<w:p[ >].*?</w:p>|<w:p/>", xml, re.S):
        runs = re.findall(r"<w:t[^>]*>(.*?)</w:t>", p, re.S)
        paragraphs.append("".join(_xml_unescape(r) for r in runs))
    return paragraphs

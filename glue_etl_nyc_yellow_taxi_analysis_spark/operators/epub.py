"""EPUB text extraction — OCF/OPF (EPUB 2/3 subset) composed from the
in-repo codecs: pkzip walks the container, the package/spine layer is
the html.py regex discipline, chapter text goes through the shared
HTML extractor.  Public specs: OCF (the ZIP container rules — the
``mimetype`` member must be FIRST and STORED), container.xml → OPF
rootfile, OPF manifest + SPINE (reading order).

- ``epub_container(chapters)`` — build a minimal valid book: stored
  ``mimetype``, META-INF/container.xml, content.opf with one manifest
  item + spine itemref per chapter, one XHTML file per chapter.
- ``epub_text(data)`` — walk the ZIP, verify the mimetype contract,
  resolve container.xml → OPF → spine → chapter files IN SPINE ORDER
  (not archive order — a mis-ordered spine must change the output),
  extract each chapter's text via the shared HTML extractor.

Seam (ebooklib swap): encrypted books (META-INF/encryption.xml), NCX
navigation, nested OPF directories beyond one level, and non-XHTML
spine items raise descriptive ValueErrors.
"""

from __future__ import annotations

import re

from . import html as html_mod
from . import pkzip

_MIMETYPE = b"application/epub+zip"

_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0" '
    'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
    '<rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>'
)

_OPF_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
    'unique-identifier="id"><metadata/>'
)


def _chapter_xhtml(text: str) -> str:
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
        # empty title: the shared extractor keeps <title> TEXT (it is
        # page text), so a non-empty one would leak into every chapter
        "<title></title></head><body><p>" + esc + "</p></body></html>"
    )


def epub_container(chapters: list[str]) -> bytes:
    """Build a minimal valid EPUB from chapter text strings."""
    manifest = "".join(
        f'<item id="c{i}" href="c{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        _OPF_HEAD
        + f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    members = [
        ("mimetype", _MIMETYPE),
        ("META-INF/container.xml", _CONTAINER.encode("utf-8")),
        ("OEBPS/content.opf", opf.encode("utf-8")),
    ] + [
        (f"OEBPS/c{i}.xhtml", _chapter_xhtml(c).encode("utf-8"))
        for i, c in enumerate(chapters)
    ]
    # OCF: mimetype FIRST and STORED; everything else deflates
    return pkzip.zip_container(
        members, methods=["stored"] + ["deflate"] * (len(members) - 1)
    )


def epub_text(data: bytes) -> list[str]:
    """Walk an EPUB → chapter texts in SPINE order."""
    members_list = pkzip.parse_zip(data)
    if not members_list or members_list[0][0] != "mimetype":
        raise ValueError("OCF violation: first member must be 'mimetype'")
    if members_list[0][1] != _MIMETYPE:
        raise ValueError("not an EPUB (wrong mimetype)")
    members = dict(members_list)
    if "META-INF/encryption.xml" in members:
        raise ValueError("encrypted EPUBs not supported")
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError("missing META-INF/container.xml")
    m = re.search(rb'full-path="([^"]+)"', container)
    if not m:
        raise ValueError("container.xml missing a rootfile path")
    opf_path = m.group(1).decode("utf-8")
    opf = members.get(opf_path)
    if opf is None:
        raise ValueError(f"missing OPF rootfile {opf_path!r}")
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    # manifest <item> elements: attributes extracted independently of
    # their order (legal XML permits any order — r10 advice); the \b
    # keeps <itemref> spine entries out of the manifest scan
    hrefs = {}
    for item in re.findall(rb"<item\b[^>]*>", opf):
        iid = re.search(rb'\bid="([^"]+)"', item)
        href = re.search(rb'\bhref="([^"]+)"', item)
        mtype = re.search(rb'\bmedia-type="([^"]+)"', item)
        if iid and href and mtype and mtype.group(1) == b"application/xhtml+xml":
            hrefs[iid.group(1)] = href.group(1)
    spine = re.findall(rb'<itemref idref="([^"]+)"', opf)
    texts: list[str] = []
    for idref in spine:
        href = hrefs.get(idref)
        if href is None:
            raise ValueError(
                f"spine itemref {idref.decode()!r} has no XHTML manifest item"
            )
        path = base + href.decode("utf-8")
        chapter = members.get(path)
        if chapter is None:
            raise ValueError(f"manifest item {path!r} missing from the package")
        texts.append(html_mod.extract_text_py(chapter.decode("utf-8")))
    return texts

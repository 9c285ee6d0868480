"""DOCX composition contract (operators/docx.py): a minimal VALID
WordprocessingML package over the in-repo ZIP walker; XML escaping;
content-type gating; stdlib-zipfile cross-read of the package."""

import io
import re
import zipfile

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import docx, pkzip


def test_roundtrip():
    paras = ["hello world", "second paragraph here", ""]
    assert docx.docx_text(docx.docx_container(paras)) == paras


def test_xml_escaping_roundtrips():
    hostile = ["a < b & c > d", "&amp; predecoded stays &amp;".replace("&amp;", "&")]
    assert docx.docx_text(docx.docx_container(hostile)) == hostile


def test_package_is_a_real_zip_with_required_parts():
    data = docx.docx_container(["x"])
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "word/document.xml"} <= names
        assert zf.testzip() is None
        xml = zf.read("word/document.xml").decode()
    assert re.search(r"<w:document[^>]*wordprocessingml", xml)
    assert "<w:t xml:space=\"preserve\">x</w:t>" in xml


def test_foreign_package_rejected():
    # same ZIP shape, wrong content type: a renamed xlsx must not
    # silently extract
    fake = pkzip.zip_container(
        [
            ("[Content_Types].xml", b"<Types>spreadsheetml.sheet.main+xml</Types>"),
            ("word/document.xml", b"<w:document/>"),
        ],
        method="deflate",
    )
    with pytest.raises(ValueError, match="WordprocessingML"):
        docx.docx_text(fake)
    with pytest.raises(ValueError, match="Content_Types"):
        docx.docx_text(pkzip.zip_container([("word/document.xml", b"<w:document/>")]))
    with pytest.raises(ValueError):
        docx.docx_text(b"PK\x03\x04 truncated")

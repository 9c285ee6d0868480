"""HTML text extraction — the step between the WARC walk and every
quality/dedup gate in a web-curation pipeline.

Two halves, both engine-portable:

- **Synth**: a deterministic HTML page per document (title, style,
  script, comment boilerplate, the doc text, an entity sample, two
  links, and — for every ``doc_id % 3 == 1`` — a malformed tag-soup
  fragment: unclosed tags, a bare ``<`` that is not a tag, an
  attribute value containing ``>``).  Implemented THREE ways that must
  agree byte-for-byte: Python (``synth_html``, feeds WARC payload
  builders), Spark column (``synth_html_col``), and a DuckDB SQL
  expression (``synth_html_sql``) — the template is stored once as
  segment constants, so the three cannot drift independently.

- **Extract**: tag-strip text extraction as PURE column expressions —
  no Python in the hot path, the whole lane stays inside
  whole-stage codegen.  Order is the standard one: drop
  ``<script>``/``<style>`` blocks, drop comments, strip remaining
  tags, decode entities (``&amp;`` LAST so decoding can't fabricate
  new entities), collapse whitespace.  The same regex steps are
  emitted as a DuckDB expression (``extract_text_sql``); every pattern
  sticks to the Java-regex ∩ RE2 common subset (no backrefs, no
  lookaround, explicit ``[ \\t\\r\\n]`` instead of the
  engine-divergent ``\\s``).

Malformed soup never raises: a regex pipeline has no parse state to
corrupt — hostile rows produce deterministic (hash-checked) text on
both engines.  The swap seam for production fidelity (boilerplate
detection à la trafilatura/jusText) is a documented upgrade, not a
different plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- the page template, as segments around the dynamic slots ------------
# full page = A1·id·A2·id·A3·text·A4·[SOUP if id%3==1]
#             ·B1·(id%5)·B2·id·B3·source·B4·id·B5
# No single quotes anywhere: every segment must embed verbatim in a
# single-quoted SQL literal.
_A1 = "<!DOCTYPE html><html><head><title>Doc "
_A2 = (
    '</title><style type="text/css">p { margin: 0; } .nav { display: none; }'
    '</style><script type="text/javascript">if (1 < 2) { var s = '
    '"<p>not text</p>"; }</script></head><body>'
    '<!-- nav: <a href="/">home</a> --><h1>Doc '
)
_A3 = "</h1><p>"
_A4 = "</p><p>&lt;tag&gt; &amp; &quot;q&quot;&nbsp;end</p>"
_SOUP = '<b>unclosed <i>soup < not a tag <p attr=">stray</p>'
_B1 = '<a href="https://m'
_B2 = ".example.org/d/"
_B3 = '">next</a> <a href="http://hub.example.net/s/'
# the page's own capture URI (rel=canonical shape): gives the frontier
# stage real already-fetched links to subtract
_B4 = '">hub</a> <a rel="canonical" href="https://crawl.example.org/doc/'
_B5 = '">self</a></body></html>'

_N_MIRRORS = 5  # link host fan-out: m0..m4.example.org


def synth_html(doc_id: int, text: str | None, source: str | None) -> str:
    """Python builder (feeds the WARC shard payloads)."""
    t = "" if text is None else text
    s = "" if source is None else source
    soup = _SOUP if doc_id % 3 == 1 else ""
    i = str(doc_id)
    return (
        _A1 + i + _A2 + i + _A3 + t + _A4 + soup
        + _B1 + str(doc_id % _N_MIRRORS) + _B2 + i + _B3 + s + _B4 + i + _B5
    )


def synth_html_col(
    doc_id: Column, text: Column, source: Column
) -> Column:
    """Spark column twin of ``synth_html`` (byte-identical output)."""
    i = doc_id.cast("string")
    return F.concat(
        F.lit(_A1), i, F.lit(_A2), i, F.lit(_A3),
        F.coalesce(text, F.lit("")),
        F.lit(_A4),
        F.when(doc_id % 3 == 1, F.lit(_SOUP)).otherwise(F.lit("")),
        F.lit(_B1), (doc_id % _N_MIRRORS).cast("string"),
        F.lit(_B2), i, F.lit(_B3),
        F.coalesce(source, F.lit("")),
        F.lit(_B4), i, F.lit(_B5),
    )


def synth_html_sql(
    id_expr: str = "doc_id",
    text_expr: str = "COALESCE(text, '')",
    src_expr: str = "COALESCE(source, '')",
) -> str:
    """DuckDB SQL twin of ``synth_html`` (byte-identical output)."""
    return (
        f"('{_A1}' || ({id_expr}) || '{_A2}' || ({id_expr}) || '{_A3}' || "
        f"{text_expr} || '{_A4}' || "
        f"CASE WHEN ({id_expr}) % 3 = 1 THEN '{_SOUP}' ELSE '' END || "
        f"'{_B1}' || (({id_expr}) % {_N_MIRRORS}) || '{_B2}' || ({id_expr}) || "
        f"'{_B3}' || {src_expr} || '{_B4}' || ({id_expr}) || '{_B5}')"
    )


# --- extraction: ordered regex steps, Java-regex ∩ RE2 subset only -------

_RE_SCRIPT = "(?is)<script[^>]*>.*?</script>"
_RE_STYLE = "(?is)<style[^>]*>.*?</style>"
_RE_COMMENT = "(?s)<!--.*?-->"
_RE_TAG = "<[^>]*>"
_RE_WS = "[ \\t\\r\\n]+"
# decode order matters: &amp; LAST, so decoding never fabricates a new
# entity out of '&amp;lt;'-style double escapes
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&nbsp;", " "), ("&amp;", "&"))


def extract_text_col(html: Column) -> Column:
    """Tag-strip text extraction as pure Spark expressions."""
    t = F.regexp_replace(html, _RE_SCRIPT, " ")
    t = F.regexp_replace(t, _RE_STYLE, " ")
    t = F.regexp_replace(t, _RE_COMMENT, " ")
    t = F.regexp_replace(t, _RE_TAG, " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, _RE_WS, " "))


def extract_text_sql(html_expr: str) -> str:
    """DuckDB SQL twin of ``extract_text_col`` (identical regex steps)."""
    t = f"regexp_replace({html_expr}, '{_RE_SCRIPT}', ' ', 'g')"
    t = f"regexp_replace({t}, '{_RE_STYLE}', ' ', 'g')"
    t = f"regexp_replace({t}, '{_RE_COMMENT}', ' ', 'g')"
    t = f"regexp_replace({t}, '{_RE_TAG}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        t = f"replace({t}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({t}, '{_RE_WS}', ' ', 'g'))"


def extract_text_py(html: str) -> str:
    """CPython twin of ``extract_text_col`` — same pattern constants,
    same step order, stdlib ``re`` — for Python-side consumers
    (jobs.process_documents routes sniffed HTML payloads here).  The
    cross-engine agreement (Python re vs Java regex) is pinned by the
    process_documents CLI test."""
    import re as _re

    t = _re.sub(_RE_SCRIPT, " ", html)
    t = _re.sub(_RE_STYLE, " ", t)
    t = _re.sub(_RE_COMMENT, " ", t)
    t = _re.sub(_RE_TAG, " ", t)
    for ent, ch in _ENTITIES:
        t = t.replace(ent, ch)
    return _re.sub(_RE_WS, " ", t).strip()


_RE_HREF = 'href="([^"]+)"'
_RE_HOST = "^https?://([^/]+)/"


def links_col(html: Column) -> Column:
    """All href values in document order (raw page — a crawl frontier
    wants the comment/nav links too; the FILTER to absolute URLs is the
    caller's next expression)."""
    return F.regexp_extract_all(html, F.lit(_RE_HREF), 1)


def host_col(url: Column) -> Column:
    """Host of an absolute http(s) URL; '' for relative links."""
    return F.regexp_extract(url, _RE_HOST, 1)

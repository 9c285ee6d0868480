"""Markdown→text extraction — pure column expressions, the
operators/html.py discipline applied to the other big text-carrier
format (READMEs, docs sites, chat exports).

Synth: a deterministic Markdown page per document (ATX header, the doc
text, emphasis, inline code, a fenced code block that must NOT leak
into the text, a kept-text link, a dropped image, a blockquote, a
list).  Spark column and DuckDB SQL builders share the template
constants.

Extract: ordered regex steps in the Java-regex ∩ RE2 subset — fences,
inline code and images dropped; link TEXT kept (the one step whose
REPLACEMENT syntax differs per engine: ``$1`` in Java, ``\\1`` in RE2 —
same pattern, per-engine replacement); line-leading header/quote/list
markers stripped; emphasis unwrapped; whitespace collapsed.

Seam: full CommonMark (nested emphasis, reference links, HTML blocks,
tables) is the documented upgrade — these pages are the subset a
corpus-cleaning pass actually normalizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# page = M1·id·M2·text·M3·id·M4·(id%5)·M5·id·M6
_M1 = "# Doc "
_M2 = "\n\nIntro paragraph.\n\n"
_M3 = "\n\n**bold"
_M4 = (
    "** and *em* plus `inline code dropped`\n\n"
    "```\nfenced code must not leak\n```\n\n"
    "[next page](https://m"
)
_M5 = ".example.org/d/"
_M6 = (
    ") ![alt text dropped](https://img.example.org/x.png)\n\n"
    "> quoted line\n\n- item one\n- item two\n"
)


def synth_md(doc_id: int, text: str | None) -> str:
    """Python builder twin (feeds jobs.process_documents' synth mode)."""
    i = str(doc_id)
    t = "" if text is None else text
    return _M1 + i + _M2 + t + _M3 + i + _M4 + str(doc_id % 5) + _M5 + i + _M6


def synth_md_col(doc_id: Column, text: Column) -> Column:
    i = doc_id.cast("string")
    return F.concat(
        F.lit(_M1), i, F.lit(_M2), F.coalesce(text, F.lit("")),
        F.lit(_M3), i, F.lit(_M4), (doc_id % 5).cast("string"),
        F.lit(_M5), i, F.lit(_M6),
    )


def synth_md_sql(id_expr: str = "doc_id", text_expr: str = "COALESCE(text, '')") -> str:
    def q(s: str) -> str:
        return s.replace("'", "''").replace("\n", "' || chr(10) || '")

    return (
        f"('{q(_M1)}' || ({id_expr}) || '{q(_M2)}' || {text_expr} || "
        f"'{q(_M3)}' || ({id_expr}) || '{q(_M4)}' || (({id_expr}) % 5) || "
        f"'{q(_M5)}' || ({id_expr}) || '{q(_M6)}')"
    )


_RE_FENCE = "(?s)```.*?```"
_RE_INLINE_CODE = "`[^`]*`"
_RE_IMAGE = "!\\[[^\\]]*\\]\\([^)]*\\)"
_RE_LINK = "\\[([^\\]]*)\\]\\([^)]*\\)"  # keep the link TEXT
_RE_LINE_MARKER = "(?m)^(#{1,6}|>|-|\\*) +"
_RE_WS = "[ \\t\\r\\n]+"


def extract_md_col(md: Column) -> Column:
    t = F.regexp_replace(md, _RE_FENCE, " ")
    t = F.regexp_replace(t, _RE_INLINE_CODE, " ")
    t = F.regexp_replace(t, _RE_IMAGE, " ")
    t = F.regexp_replace(t, _RE_LINK, "$1")
    t = F.regexp_replace(t, _RE_LINE_MARKER, "")
    t = F.replace(t, F.lit("**"), F.lit(""))
    t = F.replace(t, F.lit("*"), F.lit(""))
    return F.trim(F.regexp_replace(t, _RE_WS, " "))


def extract_md_py(md: str) -> str:
    """CPython twin of ``extract_md_col`` — same pattern constants and
    step order, for Python-side consumers (jobs.process_documents);
    cross-engine agreement pinned by that job's CLI test."""
    import re as _re

    t = _re.sub(_RE_FENCE, " ", md)
    t = _re.sub(_RE_INLINE_CODE, " ", t)
    t = _re.sub(_RE_IMAGE, " ", t)
    t = _re.sub(_RE_LINK, r"\1", t)
    t = _re.sub(_RE_LINE_MARKER, "", t)
    t = t.replace("**", "").replace("*", "")
    return _re.sub(_RE_WS, " ", t).strip()


def extract_md_sql(md_expr: str) -> str:
    t = f"regexp_replace({md_expr}, '{_RE_FENCE}', ' ', 'g')"
    t = f"regexp_replace({t}, '{_RE_INLINE_CODE}', ' ', 'g')"
    t = f"regexp_replace({t}, '{_RE_IMAGE}', ' ', 'g')"
    t = f"regexp_replace({t}, '{_RE_LINK}', '\\1', 'g')"
    # (?m) is inline in the pattern — portable to both engines
    t = f"regexp_replace({t}, '{_RE_LINE_MARKER}', '', 'g')"
    t = f"replace({t}, '**', '')"
    t = f"replace({t}, '*', '')"
    return f"trim(regexp_replace({t}, '{_RE_WS}', ' ', 'g'))"

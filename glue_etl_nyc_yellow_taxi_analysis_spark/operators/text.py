"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  Regexes are kept to the subset that
behaves identically in Java regex and RE2 so the DuckDB oracle can mirror
them.

Operators: normalization, tokenization, token counting (whitespace + a
BPE-ish regex), quality scoring (length / punctuation / stopword ratios),
n-gram-heuristic language ID, document fingerprinting (md5 content hash +
xxhash64 shingle fingerprints for near-dup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small so the oracle SQL stays writable; extend
# freely at scale (broadcast a real lexicon table instead).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "que", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "von"],
}

# Explicit whitespace class shared by Spark (Java regex) and the DuckDB
# oracles (RE2).  Java's \s is [ \t\n\x0B\f\r] but RE2's \s excludes
# vertical tab (\x0B), so a bare \s silently diverges on any document
# containing one — spell the class out so both engines match.
WS_CLASS = r"[ \t\n\x0B\f\r]"

# BPE-ish token pattern: letter runs, digit runs, or single non-space
# symbols — same semantics in Java regex (Spark) and RE2 (DuckDB).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

PUNCT_CLASS = r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"


def normalized(c: Column | str) -> Column:
    """Canonical text: lowercase, collapse whitespace, trim."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), WS_CLASS + "+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>.

    CONTRACT NOTE: empty/whitespace-only text yields ``[""]`` (one empty
    token), matching DuckDB's ``string_split('', ' ')`` — the oracle
    parity every TOKS_SQL consumer relies on.  Gate empty documents
    upstream (``n_chars > 0`` / the quality funnel) rather than here:
    changing this to ``[]`` would silently shift token counts, shingle
    sets, and every hash-checked text lane on both engines at once."""
    return F.split(normalized(c), " ")


def token_count(c: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def bpe_token_count(c: Column | str) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / symbols)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), 0))


def punct_ratio(c: Column | str) -> Column:
    """Punctuation characters / total characters (0 for empty text)."""
    c = F.col(c) if isinstance(c, str) else c
    n = F.length(c)
    n_punct = n - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(n > 0, n_punct / n).otherwise(F.lit(0.0))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (JVM higher-order fn)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: char/token counts, mean token length,
    punctuation ratio, English stopword ratio.  One Project node — no
    shuffle, scales linearly with data size.
    """
    toks = tokens(text_col)
    n_toks = F.size(toks)
    return df.withColumns(
        {
            "char_count": F.length(F.col(text_col)),
            "token_count": n_toks,
            "bpe_token_count": bpe_token_count(text_col),
            "mean_token_len": F.when(
                n_toks > 0,
                F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t))
                / n_toks,
            ).otherwise(F.lit(0.0)),
            "punct_ratio": punct_ratio(text_col),
            "stopword_ratio": F.when(n_toks > 0, stopword_hits(toks, "en") / n_toks).otherwise(
                F.lit(0.0)
            ),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-voting language ID.

    Scores each language by stopword hits over the token stream and takes
    the argmax (ties broken by fixed language order; zero hits → 'und').
    Pure column expressions — at 100 TB this is a single pass, no shuffle.
    """
    toks = tokens(text_col)
    scored = df.withColumn("__toks", toks)
    langs = list(STOPWORDS)
    for lg in langs:
        scored = scored.withColumn(f"__hits_{lg}", stopword_hits(F.col("__toks"), lg))
    best = F.greatest(*[F.col(f"__hits_{lg}") for lg in langs])
    # CASE chain in language order: first language reaching `best` wins ties
    pred = F.lit("und")
    for lg in langs[::-1]:
        pred = F.when((F.col(f"__hits_{lg}") == best) & (best > 0), lg).otherwise(pred)
    out = scored.withColumn(out_col, pred)
    return out.drop("__toks", *[f"__hits_{lg}" for lg in langs])


def content_fingerprint(c: Column | str) -> Column:
    """Deterministic content hash of normalized text (md5 hex).

    Engine-portable (md5 is identical everywhere) — this is the exact-dedup
    key; see operators/dedup.py.
    """
    return F.md5(normalized(c))


def ordered_shingles(c: Column | str, n: int = 3) -> Column:
    """Word n-grams of normalized text IN DOCUMENT ORDER (with repeats) —
    the winnowing input; ``shingles`` below is the distinct-set variant for
    Jaccard/minhash.

    CONTRACT (hypothesis-gate finding): NULL text yields the EMPTY
    stream ``[]``.  Without the guard, greatest() swallows the NULL
    size and concat_ws('', slice(NULL)) manufactures one '' shingle —
    while every DuckDB oracle's list_distinct/unnest drops the NULL
    slice, so a corpus whose ONLY ''-shingle source is a NULL-text doc
    diverged (masked on fixtures where genuinely-empty docs also
    contribute '').  Empty text keeps its one ''-shingle on BOTH
    engines (the tokens [''] contract)."""
    toks = tokens(c)
    return F.when(toks.isNull(), F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def winnow_fingerprints(c: Column | str, n: int = 3, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash the
    ordered shingle stream, slide a ``window`` over it, keep each window's
    minimum, distinct the result.

    Guarantees any shared run of ≥ window+n-1 words between two documents
    contributes a shared fingerprint — the classic plagiarism/near-dup
    selection scheme, at a fraction of full-shingle-set size.  All JVM
    higher-order functions.

    Hash = md5 hex string (not xxhash64): md5 is bit-identical in every
    engine and hex strings order lexicographically the same everywhere, so
    the window-minimum selection (array_min over strings) is replicable by
    an external SQL oracle.  Selection quality is unaffected — winnowing
    only needs a uniform pseudo-random total order on shingles.

    PERFORMANCE: this inline form re-evaluates the hash array inside the
    window lambda (no common-subexpression elimination inside higher-order
    functions → O(n_shingles²) md5 calls; measured 17s for 5000 docs).
    Hot paths should stage instead: project ``winnow_hashes`` into a
    column, then apply ``winnow_minima`` to the BOUND column (0.65s for
    the same input — 26×).  Kept for API compatibility and tests.
    """
    return winnow_minima(winnow_hashes(c, n), window)


def winnow_hashes(c: Column | str, n: int = 3) -> Column:
    """Stage 1 of staged winnowing: ordered md5 shingle hashes.  Project
    this into a column FIRST so the window pass references a materialized
    array instead of re-computing md5 per window position."""
    return F.transform(ordered_shingles(c, n), lambda s: F.md5(s))


def winnow_minima(hashes: Column | str, window: int = 4) -> Column:
    """Stage 2 of staged winnowing: distinct sliding-window minima over an
    (already materialized) ordered hash array.

    An EMPTY hash array yields NO fingerprints — without the guard,
    greatest() pins the sequence at [0] and array_min(slice([], 1, w))
    manufactures one NULL fingerprint (the ordered_shingles NULL-text
    finding, one level up)."""
    h = F.col(hashes) if isinstance(hashes, str) else hashes
    mins = F.when(
        F.size(h) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(h) - window, F.lit(0))),
            lambda i: F.array_min(F.slice(h, i + 1, window)),
        )
    )
    return F.array_distinct(mins)


def shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingle set of normalized text → array<string>.

    ``array_distinct`` over the ordered stream — one n-gram construction
    shared with the winnowing path (``ordered_shingles``).  Documents
    shorter than n words yield their full text as one shingle.
    """
    return F.array_distinct(ordered_shingles(c, n))

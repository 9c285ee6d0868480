"""robots.txt rule engine — REP 9309 longest-match semantics as pure
DataFrame operators, shared by the ``q_robots_filter`` lane and the
``jobs.web_ingest`` frontier stage.

Subset (documented seam, LOUD like the codec seams): each robots.txt
must carry only ``User-agent: *`` groups — a non-``*`` agent group
raises a descriptive error instead of silently merging its rules into
the global set, and RFC 9309 ``*``/``$`` wildcard metacharacters in a
rule path raise instead of being matched as literal prefix bytes.
Directive names are matched case-insensitively per RFC 9309 §2.1
(``disallow:`` == ``Disallow:``).  Comment lines, Crawl-delay,
Sitemap, and empty-Disallow (allow-all) lines are non-rule directives
the parser skips.

Scale shape: the rules table is |hosts|-bounded and broadcast; the
frontier streams through one prefix-match join + one keyed argmax —
no self-joins, no windows over the frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame) -> DataFrame:
    """(host, txt) → (host, is_allow, prefix): line split, Allow/
    Disallow extraction (directive names case-insensitive), everything
    else skipped.

    Unsupported-feature guards stay inside the kept expressions (the
    filter predicate and the ``prefix`` projection) so Catalyst column
    pruning cannot optimize them away: a ``User-agent:`` group naming
    any agent other than ``*`` and a rule path carrying ``*``/``$``
    wildcards both ``raise_error`` at the exact offending line instead
    of producing silently-wrong verdicts downstream."""
    lines = robots.select("host", F.explode(F.split("txt", "\n")).alias("line"))
    low = F.lower(F.trim("line"))
    is_allow_l = low.startswith("allow:")
    is_dis_l = low.startswith("disallow:")
    # guard: a non-`*` agent group would otherwise merge foreign rules
    # into the global set — the one silent mis-parse RFC 9309 forbids.
    bad_ua = low.startswith("user-agent:") & (
        F.trim(F.substring(F.trim("line"), 12, 10000)) != "*"
    )
    keep = F.when(
        bad_ua,
        F.raise_error(
            F.concat(
                F.lit(
                    "multi-group robots.txt unsupported by the subset "
                    "parser (only 'User-agent: *'): "
                ),
                F.col("line"),
            )
        ).isNotNull(),
    ).otherwise(is_allow_l | is_dis_l)
    raw_prefix = F.trim(
        F.when(is_allow_l, F.substring(F.trim("line"), 7, 10000)).otherwise(
            F.substring(F.trim("line"), 10, 10000)
        )
    )
    prefix = F.when(
        raw_prefix.rlike("[*$]"),
        F.raise_error(
            F.concat(
                F.lit(
                    "RFC 9309 wildcard metacharacters (*/$) unsupported "
                    "by the subset parser: "
                ),
                F.col("line"),
            )
        ).cast("string"),
    ).otherwise(raw_prefix)
    return (
        lines.filter(keep)
        .select(
            "host",
            F.when(is_allow_l, 1).otherwise(0).alias("is_allow"),
            prefix.alias("prefix"),
        )
        .filter(F.col("prefix") != "")  # empty Disallow: = allow-all no-op
    )


def parse_crawl_delay(robots: DataFrame) -> DataFrame:
    """(host, txt) → (host, crawl_delay_s): the REP politeness
    directive, matched case-insensitively.  Multiple groups/lines take
    the MAX (the conservative pace).  Subset seam, loud like the rule
    parser: non-integer delays (some dialects allow fractions) raise a
    descriptive error inside the kept expression.  Hosts with no
    Crawl-delay line are absent from the result — callers choose the
    default pace."""
    lines = robots.select("host", F.explode(F.split("txt", "\n")).alias("line"))
    low = F.lower(F.trim("line"))
    raw = F.trim(F.substring(F.trim("line"), 13, 10000))
    delay = F.when(
        raw.rlike("^[0-9]+$"),
        raw.cast("int"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "non-integer Crawl-delay unsupported by the subset "
                    "parser: "
                ),
                F.col("line"),
            )
        ).cast("int")
    )
    return (
        lines.filter(low.startswith("crawl-delay:"))
        .select("host", delay.alias("d"))
        .groupBy("host")
        .agg(F.max("d").alias("crawl_delay_s"))
    )


def parse_sitemap_urls(robots: DataFrame) -> DataFrame:
    """(host, txt) → (host, sitemap_url): the ``Sitemap:`` discovery
    directive (sitemaps.org cross-submission protocol — the URL may
    live on ANY host, so no same-host validation).  Case-insensitive
    directive name, multiple lines per host allowed, relative URLs
    raise (the spec requires absolute)."""
    lines = robots.select("host", F.explode(F.split("txt", "\n")).alias("line"))
    low = F.lower(F.trim("line"))
    raw = F.trim(F.substring(F.trim("line"), 9, 10000))
    url = F.when(
        raw.rlike("^https?://"),
        raw,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("Sitemap directive requires an absolute URL: "),
                F.col("line"),
            )
        ).cast("string")
    )
    return lines.filter(low.startswith("sitemap:")).select(
        "host", url.alias("sitemap_url")
    )


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, "^https?://[^/]+(/.*)$", 1)


def gate_frontier(frontier: DataFrame, rules: DataFrame, keys: list[str]) -> DataFrame:
    """Longest-prefix-match verdicts: ``frontier`` must carry ``host``
    and ``path`` plus the identity ``keys``; returns the frontier with
    ``is_allowed`` (1/0, unmatched → 1) and ``rule`` (winning prefix or
    NULL).  Ties break toward Allow (REP 9309), then lexicographically
    by prefix for full determinism."""
    matches = frontier.join(F.broadcast(rules), "host").filter(
        F.expr("left(path, length(prefix))") == F.col("prefix")
    )
    best = matches.groupBy(*keys).agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                F.col("is_allow").alias("a"),
                F.col("prefix").alias("p"),
            )
        ).alias("b")
    )
    return frontier.join(best, keys, "left").select(
        *frontier.columns,
        F.coalesce(F.col("b.a"), F.lit(1)).alias("is_allowed"),
        F.col("b.p").alias("rule"),
    )

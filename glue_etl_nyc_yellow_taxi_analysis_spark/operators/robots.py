"""robots.txt rule engine — REP 9309 longest-match semantics as pure
DataFrame operators, shared by the ``q_robots_filter`` lane and the
``jobs.web_ingest`` frontier stage.

Subset (documented seam: multi-group agent selection): each robots.txt
carries a single ``User-agent: *`` group; comment lines, Crawl-delay,
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
    Disallow extraction, everything else skipped."""
    lines = robots.select("host", F.explode(F.split("txt", "\n")).alias("line"))
    return (
        lines.filter(
            F.col("line").startswith("Allow:")
            | F.col("line").startswith("Disallow:")
        )
        .select(
            "host",
            F.when(F.col("line").startswith("Allow:"), 1)
            .otherwise(0)
            .alias("is_allow"),
            F.trim(
                F.when(
                    F.col("line").startswith("Allow:"),
                    F.substring("line", 7, 10000),
                ).otherwise(F.substring("line", 10, 10000))
            ).alias("prefix"),
        )
        .filter(F.col("prefix") != "")  # empty Disallow: = allow-all no-op
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

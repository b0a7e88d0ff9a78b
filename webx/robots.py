"""robots.txt rule engine — parse + URL gate (RFC 9309 Robots Exclusion
Protocol).

The crawl-side counterpart to the page-side ``robots_meta`` flags
(webx/urls.py): before a fetcher ever sees a page, the host's
``robots.txt`` decides whether the URL may be fetched at all. The
reference ships dataset *adapters* that normalize one on-disk layout
into canonical rows (mindocr/data/det_dataset.py:1); this module is the
same idea for the crawl-policy surface: robots bytes in, canonical rule
rows out, then a relational gate that joins the rules against a URL
frontier.

Everything is relational and JVM-side:

* ``parse_robots`` — lines via ``posexplode(split())``, directive
  classification via ``regexp_extract``, RFC 9309 *group* formation
  (consecutive ``User-agent`` lines share the rule block that follows)
  via a lag + conditional-cumsum window partitioned by host. One
  narrow shuffle on the natural key (host); robots files are tiny, so
  the window state is bounded by file line count.
* ``robots_gate`` — rules are per-host and small relative to any real
  frontier, so the rule table is ``broadcast()``; the gate is a
  map-side fan-out join (URL × matching rules) followed by a
  ``max_by`` argmax per URL implementing the RFC's longest-match rule
  with Allow winning length ties. Partial aggregation means the one
  shuffle moves ``(url, tiny struct)``, never pages. URLs on hosts
  with no rules (or no matching group) are allowed — REP's default.

Pattern semantics: ``*`` matches any char run, ``$`` anchors the end;
everything else is literal (regex specials are escaped before the
translate). Group selection is exact-agent-match else ``*`` (the
product-token prefix matching real crawlers layer on top is a
stated simplification). Empty ``Disallow:`` lines are dropped — RFC
9309 §2.2.2: an empty pattern matches nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["parse_robots", "robots_gate", "crawl_delays", "sitemap_urls"]

_DIRECTIVE_RE = r"^([A-Za-z-]+)\s*:"
_VALUE_RE = r"^[A-Za-z-]+\s*:\s*(.*?)\s*$"


def _lines(robots: DataFrame, txt_col: str, host_col: str) -> DataFrame:
    """robots.txt text → one classified row per directive line:
    (host, line_no, directive, value). Comments (#…) stripped first;
    blank / non-directive lines dropped (REP says ignore them)."""
    line = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(txt_col), "\r?\n")).alias("line_no", "line"),
        )
        .withColumn("line", line)
        .withColumn(
            "directive", F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1))
        )
        .withColumn("value", F.regexp_extract("line", _VALUE_RE, 1))
        .filter(F.col("directive") != "")
    )


def parse_robots(
    robots: DataFrame, txt_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """robots.txt per host → canonical rule rows
    ``(host, group_id, agent, rule, value)``.

    ``rule`` ∈ {allow, disallow, crawl-delay}; one row per
    (agent in group) × (rule in group) — the join that distributes a
    group's rules to each of its ``User-agent`` lines is per-host and
    bounded by file size. ``group_id`` is the 1-based group ordinal
    within the host's file (RFC 9309 §2.1: a group is one or more
    user-agent lines followed by rules; a user-agent line whose
    predecessor is not a user-agent line starts a new group)."""
    lines = _lines(robots, txt_col, host_col)
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("directive") == "user-agent"
    prev = F.lag("directive").over(w)
    starts = (is_ua & (prev.isNull() | (prev != "user-agent"))).cast("int")
    grouped = lines.withColumn(
        "group_id",
        F.sum(starts).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).filter(F.col("group_id") > 0)  # rules before any user-agent line: ignored

    agents = grouped.filter(is_ua).select(
        "host", "group_id", F.lower("value").alias("agent")
    )
    rules = grouped.filter(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
        & (F.col("value") != "")
    ).select(
        "host",
        "group_id",
        F.col("directive").alias("rule"),
        "value",
        F.col("line_no").alias("rule_line"),
    )
    return agents.join(rules, ["host", "group_id"]).select(
        "host", "group_id", "agent", "rule", "value", "rule_line"
    )


def _pattern_regex(pat: Column) -> Column:
    """robots path pattern → anchored regex: escape regex specials,
    then ``*`` → ``.*``; a trailing ``$`` (and only a trailing one)
    anchors the end."""
    ends = pat.rlike(r"\$$")
    core = F.regexp_replace(pat, r"\$$", "")
    esc = F.regexp_replace(core, r"([.^$|?+()\[\]{}\\])", r"\\$1")
    rx = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), rx, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def url_path(url: Column | str) -> Column:
    """scheme://host[/path] → /path (path + query, REP's match target);
    no path → '/'."""
    c = F.col(url) if isinstance(url, str) else url
    p = F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_gate(
    pages: DataFrame,
    rules: DataFrame,
    agent: str = "webxbot",
    url_col: str = "url",
) -> DataFrame:
    """URL frontier × parsed rules → ``allowed`` verdict per input row.

    RFC 9309 evaluation: pick the host's group for ``agent`` (exact
    match) if one exists, else the ``*`` group; among that group's
    path rules that match the URL path, the LONGEST pattern wins, and
    ``allow`` beats ``disallow`` on equal length. No group / no match
    / no robots.txt → allowed.

    Adds ``allowed`` (boolean) and ``matched_rule`` (the winning
    pattern, NULL when nothing matched). The rules side is broadcast;
    the only shuffle is the per-URL argmax on ``(url, 16-byte
    struct)``."""
    from webx.urls import host as url_host

    path_rules = rules.filter(F.col("rule").isin("allow", "disallow"))
    has_specific = path_rules.groupBy("host").agg(
        F.max((F.col("agent") == agent.lower()).cast("int")).alias("has_agent")
    )
    chosen = (
        path_rules.join(has_specific, "host")
        .filter(
            F.when(F.col("has_agent") == 1, F.col("agent") == agent.lower())
            .otherwise(F.col("agent") == "*")
        )
        .select(
            F.col("host").alias("r_host"),
            "rule",
            "value",
            F.length("value").alias("pat_len"),
            _pattern_regex(F.col("value")).alias("pat_rx"),
        )
    )
    keyed = pages.select(
        F.col(url_col).alias("__url"),
        url_host(url_col).alias("__host"),
        url_path(url_col).alias("__path"),
    )
    matched = keyed.join(
        F.broadcast(chosen),
        (F.col("__host") == F.col("r_host"))
        & F.expr("__path RLIKE pat_rx"),
        "left",
    )
    verdict = matched.groupBy("__url").agg(
        F.max_by(
            F.struct(
                (F.col("rule") == "allow").alias("is_allow"),
                F.col("value").alias("pattern"),
            ),
            F.struct(
                F.col("pat_len"),
                (F.col("rule") == "allow").cast("int").alias("tie"),
            ),
        ).alias("win")
    )
    out = pages.join(
        verdict, pages[url_col] == verdict["__url"], "left"
    )
    return out.select(
        *[pages[c] for c in pages.columns],
        F.coalesce(F.col("win.is_allow"), F.lit(True)).alias("allowed"),
        F.col("win.pattern").alias("matched_rule"),
    )


def crawl_delays(rules: DataFrame, agent: str = "webxbot") -> DataFrame:
    """Per-host crawl delay for ``agent`` (exact match else ``*``),
    seconds as double; hosts without a delay directive are absent —
    the politeness scheduler treats absence as its own default."""
    delays = rules.filter(F.col("rule") == "crawl-delay").select(
        "host",
        "agent",
        F.col("value").cast("double").alias("delay_s"),
    )
    has_specific = delays.groupBy("host").agg(
        F.max((F.col("agent") == agent.lower()).cast("int")).alias("has_agent")
    )
    return (
        delays.join(has_specific, "host")
        .filter(
            F.when(F.col("has_agent") == 1, F.col("agent") == agent.lower())
            .otherwise(F.col("agent") == "*")
        )
        .groupBy("host")
        .agg(F.min("delay_s").alias("delay_s"))
    )


def schedule_frontier(
    frontier: DataFrame,
    delays: DataFrame,
    start_epoch: int,
    default_delay: float = 1.0,
    url_col: str = "url",
) -> DataFrame:
    """Politeness scheduler: per-host fetch slots for a URL frontier.

    Each host is a serial queue — slot ``k`` fetches at
    ``start_epoch + k * delay`` where ``delay`` is the host's
    crawl-delay (``crawl_delays`` output, broadcast) or
    ``default_delay``. Slot order is by URL (deterministic across
    runs/partitionings). ONE shuffle, on host — exactly the politeness
    key; the window carries only (url, slot). A mega-host serializes
    into one partition by construction (its fetches are serial anyway);
    if slot *assignment* itself ever bottlenecks, range-partition the
    sorted urls per host and offset slots by range start.

    Adds ``fetch_slot`` (0-based) and ``fetch_at`` (epoch seconds,
    double)."""
    from webx.urls import host as url_host

    w = Window.partitionBy("__host").orderBy(url_col)
    keyed = frontier.withColumn("__host", url_host(url_col))
    joined = keyed.join(
        F.broadcast(delays.withColumnRenamed("host", "__host")),
        "__host",
        "left",
    )
    slot = F.row_number().over(w) - 1
    delay = F.coalesce(F.col("delay_s"), F.lit(float(default_delay)))
    return joined.select(
        *[F.col(c) for c in frontier.columns],
        slot.alias("fetch_slot"),
        (F.lit(float(start_epoch)) + slot * delay).alias("fetch_at"),
    )


def sitemap_urls(
    robots: DataFrame, txt_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """``Sitemap:`` directives (host-wide per RFC 9309 — not part of any
    group) → (host, sitemap_url) rows, feeding webx/feeds.parse_sitemap."""
    return (
        _lines(robots, txt_col, host_col)
        .filter(F.col("directive") == "sitemap")
        .select("host", F.col("value").alias("sitemap_url"))
    )

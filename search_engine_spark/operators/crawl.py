"""Offline crawl operators — the reference's crawler stack (S1–S3)
re-expressed as distributed DataFrame transforms.

The reference crawls live HTTP one url at a time from a deque
(src/crawler/universal_crawler.py:132-171 `_crawl_loop`,
url_manager.py:87-152, page_downloader.py:56-113,
robots_parser.py:57-144, crawler.py:139-218 for the Wikipedia
category seed scan). Network IO is not a Spark operator: at 10^12
documents a crawl is a *frontier dataset* joined against a
*fetched-content dataset* wave by wave — the WARC / Common-Crawl
model, where the "fetch" is a join keyed on url and the per-host
politeness loop lives in a separate fetch fleet. This module keeps
the reference's crawl semantics and bookkeeping but runs each BFS
wave as a handful of declarative DataFrame ops:

- :func:`parse_robots_rules` — reference-compat robots.txt parsing
  (robots_parser.py:57-102) including its quirks, each pinned by a
  unit test: only ``Disallow`` is honored, ``Allow`` is parsed and
  ignored (line 98-100), ``Disallow: /`` is DROPPED (line 95 —
  ``if value and value != '/'``), a new ``User-agent`` line RESETS
  the active group (line 88: ``current_agents = [agent]``) so
  consecutive agent lines do not accumulate, directives match
  case-insensitively, agents are exact lowercase keys (no REP
  substring matching), and matching is a plain path-prefix test over
  the union of ``*``'s and the agent's rules (lines 132-142).
- :func:`robots_filter` — the distributed application: per-domain
  robots bodies are compiled to a sorted disallow-prefix array by an
  Arrow-batched pandas UDF (one row per domain — tiny next to the
  page table), joined on host (AQE broadcasts the compiled side when
  it is small, which it essentially always is), and the prefix test
  runs JVM-side as ``exists(prefixes, p -> startswith(path, p))`` —
  no Python in the per-page path. Pages whose host has no robots row
  are allowed, like the reference's fetch-failure fallback
  (robots_parser.py:122-127). One divergence, recorded here: the
  reference keys its rule cache on ``urlparse().netloc`` (host:port)
  while ``parse_url(url, 'HOST')`` strips the port; portless urls —
  every url in this corpus — behave identically.
- :func:`crawl_frontier` — bounded-depth BFS over an explicit edge
  table: per wave one join (frontier ⋈ edges, frontier side is the
  small one → AQE broadcast), one distinct, one anti-join against
  the visited set, all localCheckpointed so lineage stays O(1) in
  the wave number. Depth bookkeeping matches url_manager.py:109-152:
  seeds at depth 0, links from depth d enqueue at d+1 only while
  d < max_depth, first discovery wins (min-depth).
- :func:`crawl` — the full loop (universal_crawler.py:132-171 and
  :172-224 `_process_page`): frontier → robots gate → fetch (join
  against the content store) → parse/extract (the E1-E10 kernel,
  :func:`...source_parsers.parse_pages_map`) → min-length gate
  (content shorter than ``min_article_length`` is marked failed and
  its links are NOT followed, exactly like the early return at
  universal_crawler.py:196-200) → link normalize/dedup → next wave.
  Failed pages (robots-blocked, missing from the store, too short)
  count as visited and are never retried, like
  ``mark_url_as_failed`` (url_manager.py:154-170).
- :func:`wikipedia_category_seeds` — S1's offline analog: category
  membership is a dataset (page url, category) instead of a
  MediaWiki API call; member pages of the category plus (optionally)
  the members of its first ``max_subcats`` subcategories, mirroring
  crawler.py:139-218's one-level subcategory expansion with its
  10-subcategory cap (we order subcategories for determinism where
  the reference takes API order).

Scale notes (10^12 pages, 1000 executors): the store join is the
only corpus-sized operation per wave and it is a key-equal join that
AQE turns into a broadcast of the (much smaller) frontier; the edge/
link explode is bounded by the wave's page count × links-per-page;
the visited set is the one structure that grows monotonically — here
it is a union of localCheckpointed wave frames, at warehouse scale
it would be a bucketed table with a bloom-filter anti-join. Nothing
collects to the driver except per-wave counts (loop control) and the
per-domain compiled robots (bounded by domain count, and only if the
optimizer chooses to broadcast).

Live HTTP fetching (page_downloader.py:56-113: retries with
exponential backoff, 429 handling, per-host delays) is intentionally
not implemented — this sandbox has no network, and in the target
architecture the fetcher is an external fleet writing the content
store this module joins against.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Set, Union

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.source_parsers import (
    PARSE_SCHEMA,
    normalize_url_col,
    parse_pages_map,
)

DEFAULT_USER_AGENT = "SearchEngineBot"


# ---------------------------------------------------------------------------
# S3: robots.txt — reference-compat parse + single-node refmodel
# ---------------------------------------------------------------------------


def parse_robots_rules(content: str) -> Dict[str, Set[str]]:
    """Parse a robots.txt body into ``{agent: {disallow_prefix, ...}}``
    with the reference's exact semantics (robots_parser.py:57-102).

    Quirks preserved on purpose (each unit-pinned): ``Allow`` ignored,
    ``Disallow: /`` and empty ``Disallow:`` dropped, a ``User-agent``
    line resets (not extends) the active group, directives and agent
    names are lowercased, unknown directives and malformed lines are
    skipped silently.
    """
    rules: Dict[str, Set[str]] = {}
    current_agents: List[str] = []
    for line in (content or "").split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = re.split(r":\s*", line, maxsplit=1)
        if len(parts) != 2:
            continue
        directive = parts[0].lower()
        value = parts[1].strip()
        if directive == "user-agent":
            agent = value.lower()
            current_agents = [agent]
            if agent not in rules:
                rules[agent] = set()
        elif directive == "disallow" and current_agents:
            for agent in current_agents:
                if value and value != "/":
                    rules[agent].add(value)
        elif directive == "allow" and current_agents:
            pass  # reference parses and discards Allow (line 98-100)
    return rules


def disallow_prefixes(
    rules: Dict[str, Set[str]], user_agent: str = DEFAULT_USER_AGENT
) -> List[str]:
    """The merged, sorted disallow set the reference checks: rules for
    ``*`` union rules for the exact lowercased agent
    (robots_parser.py:132-136). Sorted for determinism — the
    reference iterates a set."""
    merged = rules.get("*", set()) | rules.get(user_agent.lower(), set())
    return sorted(merged)


def is_allowed(
    url: str,
    rules_by_domain: Dict[str, Dict[str, Set[str]]],
    user_agent: str = DEFAULT_USER_AGENT,
) -> bool:
    """Single-node refmodel of robots_parser.py:104-144 (used by the
    parity tests; the distributed path is :func:`robots_filter`).
    ``rules_by_domain`` plays the role of the reference's fetch cache;
    a missing domain means "no robots.txt" → allowed."""
    from urllib.parse import urlparse

    parsed = urlparse(url)
    rules = rules_by_domain.get(parsed.netloc, {})
    path = parsed.path
    for prefix in disallow_prefixes(rules, user_agent):
        if path.startswith(prefix):
            return False
    return True


def compile_robots(
    robots: DataFrame,
    user_agent: str = DEFAULT_USER_AGENT,
    domain_col: str = "domain",
    content_col: str = "robots_txt",
) -> DataFrame:
    """``(domain, robots_txt)`` → ``(domain, disallow array<string>)``.

    Parsing runs distributed (Arrow-batched pandas UDF) because the
    domain table at web scale is ~10^8 rows — small next to the page
    table but not driver-side material. The output is what
    :func:`robots_filter` joins against.

    The input is deduped to ONE row per domain first (min body wins —
    deterministic, unlike the reference's first-fetch-wins dict cache,
    robots_parser.py:122-127): duplicate domain rows would otherwise
    fan out every matching page row through the join."""
    ua = user_agent

    @F.pandas_udf("array<string>")
    def _compile(bodies: pd.Series) -> pd.Series:
        return bodies.map(
            lambda b: disallow_prefixes(parse_robots_rules(b), ua)
        )

    return (
        robots.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.min(F.col(content_col).cast("string")).alias("_body"))
        .select(
            "domain",
            _compile(F.col("_body")).alias("disallow"),
        )
    )


def _apply_compiled_robots(
    pages: DataFrame, compiled: DataFrame, url_col: str, annotate: bool
) -> DataFrame:
    """Join pre-compiled ``(domain, disallow)`` rules onto a page table
    and run the JVM prefix test. Split out so the crawl loop compiles
    robots ONCE and re-applies per wave (Spark shares no subplans — a
    per-wave compile would re-run the parse UDF every wave)."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit(""))
    joined = (
        pages.withColumn("_robots_host", host)
        .withColumn("_robots_path", path)
        .join(compiled, F.col("_robots_host") == F.col("domain"), "left")
    )
    blocked = F.when(F.col("disallow").isNull(), F.lit(False)).otherwise(
        F.exists("disallow", lambda p: F.col("_robots_path").startswith(p))
    )
    out = joined.withColumn("robots_allowed", ~blocked).drop(
        "_robots_host", "_robots_path", "domain", "disallow"
    )
    if annotate:
        return out
    return out.where(F.col("robots_allowed")).drop("robots_allowed")


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    user_agent: str = DEFAULT_USER_AGENT,
    url_col: str = "url",
    domain_col: str = "domain",
    content_col: str = "robots_txt",
    annotate: bool = False,
) -> DataFrame:
    """Apply per-domain robots rules to a page table.

    ``annotate=False`` (default) returns only the allowed pages;
    ``annotate=True`` returns every page plus a boolean
    ``robots_allowed`` column (the crawl loop uses this to count the
    blocked pages as visited-but-failed). The prefix test is pure JVM:
    ``exists(disallow, p -> startswith(path, p))`` after a host-keyed
    join with the compiled rules (broadcast-sized in practice — AQE
    decides)."""
    compiled = compile_robots(
        robots, user_agent, domain_col=domain_col, content_col=content_col
    )
    return _apply_compiled_robots(pages, compiled, url_col, annotate)


# ---------------------------------------------------------------------------
# S1 (offline analog): Wikipedia category seed scan
# ---------------------------------------------------------------------------


def wikipedia_category_seeds(
    membership: DataFrame,
    category: str,
    include_subcats: bool = True,
    max_subcats: int = 10,
    url_col: str = "url",
    category_col: str = "category",
) -> DataFrame:
    """Offline analog of the reference's category seed scan
    (crawler.py:139-218): given a ``(url, category)`` membership table
    — the dataset a MediaWiki dump provides where the reference pages
    the live API — return the seed urls for ``category``: its direct
    member pages plus, when ``include_subcats``, the member pages of
    its first ``max_subcats`` subcategories (one level, like the
    reference; crawler.py:209 caps at 10). Subcategory members carry
    the ``Category:`` url prefix in the membership table; we order
    subcategories lexically for determinism where the reference takes
    API order. Returns distinct ``url`` rows."""
    url = F.col(url_col)
    cat = F.col(category_col)
    direct = membership.where(cat == category).select(url.alias("url"))
    if not include_subcats:
        return direct.where(~F.col("url").startswith("Category:")).distinct()
    subcats = (
        membership.where(cat == category)
        .where(url.startswith("Category:"))
        .select(F.expr(f"substring({url_col}, 10)").alias("_subcat"))
        .distinct()
        .orderBy("_subcat")
        .limit(max_subcats)
    )
    via_sub = membership.join(
        subcats, F.col(category_col) == F.col("_subcat"), "inner"
    ).select(url.alias("url"))
    return (
        direct.unionByName(via_sub)
        .where(~F.col("url").startswith("Category:"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# BFS frontier over an explicit edge table
# ---------------------------------------------------------------------------


def _as_url_df(spark: SparkSession, seeds) -> DataFrame:
    if isinstance(seeds, DataFrame):
        return seeds
    return spark.createDataFrame([(u,) for u in seeds], "url string")


def crawl_frontier(
    edges: DataFrame,
    seeds,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    normalize: bool = True,
    with_stats: bool = False,
    cache_edges: bool = False,
):
    """Bounded-depth BFS reachability over a ``(src, dst)`` link table.

    Returns ``(df, stats)`` where ``df`` is ``(url, depth)`` — depth =
    the FIRST wave each url was discovered in, i.e. min BFS depth ≤
    ``max_depth`` — and ``stats`` mirrors url_manager.get_stats
    bookkeeping (url_manager.py:184-195): ``total_discovered`` /
    ``total_visited`` (equal at exhaustion — every enqueued url gets
    dequeued), ``total_skipped`` (link occurrences that pointed at an
    already-known url, url_manager.py:141-143), plus ``waves``.

    Per wave: one frontier ⋈ edges join (frontier is the small side →
    AQE broadcast), one distinct, one anti-join vs visited, one
    localCheckpoint (cuts lineage — wave W's plan never re-executes
    waves 0..W-1). Rounds are bounded by ``max_depth``, like the
    min-label loop in dedup.connected_components. ``cache_edges``
    persists the (normalized) edge table DISK_ONLY across waves —
    worth it when the edge source is an expensive scan and
    ``max_depth`` > 1; the memory-columnar cache is avoided for the
    measured 3-4x wall variance (CLAUDE.md)."""
    from pyspark import StorageLevel

    spark = edges.sparkSession
    seeds_df = _as_url_df(spark, seeds)
    seed_url = F.col(seeds_df.columns[0])
    if normalize:
        seeds_df = seeds_df.select(normalize_url_col(seed_url).alias("url"))
        edges = edges.select(
            normalize_url_col(F.col(src_col)).alias("src"),
            normalize_url_col(F.col(dst_col)).alias("dst"),
        )
    else:
        seeds_df = seeds_df.select(seed_url.alias("url"))
        edges = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
    if cache_edges:
        edges = edges.persist(StorageLevel.DISK_ONLY)

    visited = (
        seeds_df.where(F.col("url").isNotNull())
        .distinct()
        .withColumn("depth", F.lit(0).cast("int"))
        .localCheckpoint()
    )
    n_seeds = visited.count()
    stats = {
        "total_discovered": n_seeds,
        "total_visited": n_seeds,
        "total_skipped": 0,
        "waves": 0,
    }
    frontier = visited.select("url")
    for depth in range(1, max_depth + 1):
        # null dst must be dropped HERE: a null key never matches in
        # the left_anti join (null == null is not true), so a null row
        # would be "re-discovered" every wave — inflating the stats and
        # suppressing the empty-frontier early exit
        cand = (
            frontier.join(edges, frontier["url"] == edges["src"], "inner")
            .select(F.col("dst").alias("url"))
            .where(F.col("url").isNotNull())
        )
        if with_stats:
            n_occurrences = cand.count()
        new = (
            cand.distinct()
            .join(visited.select("url"), "url", "left_anti")
            .withColumn("depth", F.lit(depth).cast("int"))
            .localCheckpoint()
        )
        n_new = new.count()
        if with_stats:
            stats["total_skipped"] += n_occurrences - n_new
        stats["total_discovered"] += n_new
        stats["total_visited"] += n_new
        stats["waves"] = depth
        if n_new == 0:
            break
        visited = visited.unionByName(new)
        frontier = new.select("url")
    if cache_edges:
        edges.unpersist()
    return visited, stats


# ---------------------------------------------------------------------------
# S2 + the full loop: wave-at-a-time crawl against a content store
# ---------------------------------------------------------------------------


def _parse_keep_depth(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """parse_pages_map plus a passed-through depth column (the parse
    kernel emits rows in input order, so positional alignment holds)."""
    for pdf in batches:
        out = next(iter(parse_pages_map([pdf])))
        out["depth"] = pdf["depth"].values
        yield out


_CRAWL_PARSE_SCHEMA = PARSE_SCHEMA + ", depth int"


def crawl(
    store: DataFrame,
    seeds,
    robots: Optional[DataFrame] = None,
    max_depth: int = 3,
    max_pages: Optional[int] = None,
    min_article_length: int = 1000,
    user_agent: str = DEFAULT_USER_AGENT,
    url_col: str = "url",
    html_col: str = "html",
    with_stats: bool = False,
):
    """The reference crawl loop (universal_crawler.py:132-224) as a
    wave-at-a-time dataflow over a content ``store`` (url, html).

    Per wave (= all frontier urls at one depth):

    1. robots gate — blocked urls count as visited-but-failed, their
       content is never read (download_page checks robots before the
       GET, page_downloader.py:68-71);
    2. fetch — a left join against the store; urls missing from the
       store fail like a download error (marked visited, no links);
    3. parse — the shared E1-E10 kernel (title/content/links);
    4. min-length gate — ``len(content) < min_article_length`` fails
       the page AND drops its links (universal_crawler.py:196-200);
    5. ``max_pages`` cap — applied in global url order within the
       final wave (documented divergence: the reference stops its
       FIFO queue mid-wave in arrival order; a distributed crawl has
       no single arrival order, so the cut is by sorted url, which is
       deterministic), and capped-out pages contribute no links;
    6. links from surviving pages (absolutized/deduped per parser,
       source_parsers E10) are normalized (E12), deduped against the
       visited set, and become the next frontier at depth+1 — only
       while depth < max_depth (url_manager.py:127-128).

    Returns ``(pages, stats)``: ``pages`` = one row per collected page
    (url, source, title, content, meta_description, language,
    metadata, links, raw_links, depth); ``stats`` mirrors the
    reference counters (pages_collected, total_discovered,
    total_visited, total_skipped, failed_robots / failed_fetch /
    failed_short, waves). Counts that only feed reporting are gated on
    ``with_stats``; loop-control counts always run. Every wave frame
    is localCheckpointed, so lineage and re-execution stay O(1) in the
    wave number and the two consumers of the parsed frame (collected
    pages + next-frontier links) never recompute the parse."""
    from pyspark import StorageLevel

    spark = store.sparkSession
    # Persist the normalized/deduped store across waves: every wave's
    # fetch join consumes it and Spark shares no subplans between
    # consumers (CLAUDE.md) — unpersisted, the corpus-sized groupBy
    # would re-execute once per wave. DISK_ONLY for the measured 3-4x
    # memory-cache wall variance on multi-GB frames.
    store_norm = (
        store.select(
            normalize_url_col(F.col(url_col)).alias("url"),
            F.col(html_col).alias("html"),
        )
        .where(F.col("url").isNotNull())
        .groupBy("url")
        .agg(F.min("html").alias("html"))  # deterministic on collisions
        .persist(StorageLevel.DISK_ONLY)
    )
    # Persist the compiled rules too: every wave (twice per wave with
    # stats) runs an action whose plan contains the parse UDF, and
    # Spark re-executes it each time without a persist — "compile once"
    # needs a materialization, not just a shared plan object.
    compiled_robots = None
    if robots is not None:
        compiled_robots = compile_robots(robots, user_agent).persist(
            StorageLevel.DISK_ONLY
        )

    seeds_df = _as_url_df(spark, seeds)
    frontier = (
        seeds_df.select(
            normalize_url_col(F.col(seeds_df.columns[0])).alias("url")
        )
        .where(F.col("url").isNotNull())
        .distinct()
        .withColumn("depth", F.lit(0).cast("int"))
        .localCheckpoint()
    )
    visited = frontier.select("url")
    n_frontier = frontier.count()
    stats = {
        "pages_collected": 0,
        "total_discovered": n_frontier,
        "total_visited": 0,
        "total_skipped": 0,
        "failed_robots": 0,
        "failed_fetch": 0,
        "failed_short": 0,
        "waves": 0,
    }
    collected: List[DataFrame] = []

    while n_frontier > 0:
        depth = stats["waves"]
        stats["total_visited"] += n_frontier

        if compiled_robots is not None:
            gated = _apply_compiled_robots(
                frontier, compiled_robots, "url", annotate=True
            )
            allowed = gated.where(F.col("robots_allowed")).drop(
                "robots_allowed"
            )
            if with_stats:
                n_allowed = allowed.count()
                stats["failed_robots"] += n_frontier - n_allowed
        else:
            allowed = frontier

        fetched = allowed.join(store_norm, "url", "left")
        parsed = (
            fetched.where(F.col("html").isNotNull())
            .mapInPandas(_parse_keep_depth, _CRAWL_PARSE_SCHEMA)
            .localCheckpoint()
        )
        if with_stats:
            n_parsed = parsed.count()
            stats["failed_fetch"] += (
                (n_allowed if robots is not None else n_frontier) - n_parsed
            )

        good = parsed.where(
            F.length(F.coalesce(F.col("content"), F.lit("")))
            >= min_article_length
        ).localCheckpoint()
        n_good = good.count()
        if with_stats:
            stats["failed_short"] += n_parsed - n_good

        if max_pages is not None:
            remaining = max_pages - stats["pages_collected"]
            if n_good > remaining:
                good = (
                    good.orderBy("url").limit(remaining).localCheckpoint()
                )
                n_good = remaining
        stats["pages_collected"] += n_good
        collected.append(good)

        done = (
            depth >= max_depth
            or (max_pages is not None and stats["pages_collected"] >= max_pages)
        )
        if done:
            stats["waves"] = depth + 1
            break

        links = good.select(F.explode("links").alias("url"))
        if with_stats:
            n_occurrences = links.count()
        new = (
            links.select(normalize_url_col(F.col("url")).alias("url"))
            .where(F.col("url").isNotNull())
            .distinct()
            .join(visited, "url", "left_anti")
            .withColumn("depth", F.lit(depth + 1).cast("int"))
            .localCheckpoint()
        )
        n_new = new.count()
        if with_stats:
            stats["total_skipped"] += n_occurrences - n_new
        stats["total_discovered"] += n_new
        stats["waves"] = depth + 1
        visited = visited.unionByName(new.select("url"))
        frontier = new
        n_frontier = n_new

    store_norm.unpersist()  # every wave frame is localCheckpointed
    if compiled_robots is not None:
        compiled_robots.unpersist()
    if collected:
        pages = collected[0]
        for frame in collected[1:]:
            pages = pages.unionByName(frame)
    else:
        pages = spark.createDataFrame([], _CRAWL_PARSE_SCHEMA)
    return pages, stats

"""Crawl-stack tests (S1–S3): robots.txt parity with the reference
model, BFS frontier semantics, and the full wave-at-a-time crawl loop.

The robots parser is pinned against the reference's exact quirks
(robots_parser.py:57-144); the distributed robots_filter is pinned
against the single-node refmodel over a url grid; crawl_frontier
against hand-computed min-depths on a graph with a cycle, a diamond,
and an unreachable island; crawl() against a small linked HTML corpus
exercising every failure class (robots-blocked, missing-from-store,
too-short) and the links-only-from-successful-pages rule."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.crawl import (
    DEFAULT_USER_AGENT,
    crawl,
    crawl_frontier,
    disallow_prefixes,
    is_allowed,
    parse_robots_rules,
    robots_filter,
    wikipedia_category_seeds,
)

ROBOTS = """# comment line
User-agent: BadBot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/open
Disallow:
Crawl-delay: 5

User-agent: SearchEngineBot
Disallow: /tmp
user-agent: a
user-agent: b
disallow: /zz
malformed line without colon
"""


class TestRobotsParse:
    def test_groups_and_quirks(self):
        rules = parse_robots_rules(ROBOTS)
        # 'Disallow: /' dropped (robots_parser.py:95 value != '/')
        assert rules["badbot"] == set()
        # Allow ignored, empty Disallow dropped, unknown directives skipped
        assert rules["*"] == {"/private"}
        # agent keys lowercased
        assert rules["searchenginebot"] == {"/tmp"}
        # consecutive User-agent lines RESET the group (line 88):
        # only the LAST agent before the Disallow gets the rule
        assert rules["a"] == set()
        assert rules["b"] == {"/zz"}

    def test_colon_split_no_space(self):
        rules = parse_robots_rules("User-agent:*\nDisallow:/x")
        assert rules["*"] == {"/x"}

    def test_disallow_before_any_agent_ignored(self):
        assert parse_robots_rules("Disallow: /x") == {}

    def test_empty_and_none(self):
        assert parse_robots_rules("") == {}
        assert parse_robots_rules(None) == {}

    def test_merged_prefixes_sorted(self):
        rules = parse_robots_rules(ROBOTS)
        assert disallow_prefixes(rules, "SearchEngineBot") == [
            "/private",
            "/tmp",
        ]
        # unknown agent gets only the * rules
        assert disallow_prefixes(rules, "Nobody") == ["/private"]

    def test_is_allowed_refmodel(self):
        cache = {"x.org": parse_robots_rules(ROBOTS)}
        assert not is_allowed("http://x.org/private/sub", cache)
        assert not is_allowed("http://x.org/tmp", cache)
        assert is_allowed("http://x.org/privateer-not-really", cache) is False
        # prefix semantics: '/private' blocks '/privateer' too (reference
        # uses str.startswith, not path-segment matching)
        assert is_allowed("http://x.org/ok", cache)
        # domain without robots -> allowed
        assert is_allowed("http://y.org/private/sub", cache)


@pytest.fixture(scope="module")
def robots_df(spark):
    return spark.createDataFrame(
        [("x.org", ROBOTS), ("empty.org", "")],
        "domain string, robots_txt string",
    )


class TestRobotsFilter:
    def test_parity_with_refmodel(self, spark, robots_df):
        urls = [
            "http://x.org/private/a",
            "http://x.org/private",
            "http://x.org/tmp/zz",
            "http://x.org/ok/private",
            "http://x.org/",
            "http://x.org/zz",  # only agents a/b are blocked from /zz
            "http://empty.org/private/a",
            "http://nobody.org/tmp",
        ]
        pages = spark.createDataFrame([(u,) for u in urls], "url string")
        got = sorted(
            r.url for r in robots_filter(pages, robots_df).collect()
        )
        cache = {
            "x.org": parse_robots_rules(ROBOTS),
            "empty.org": parse_robots_rules(""),
        }
        want = sorted(u for u in urls if is_allowed(u, cache))
        assert got == want
        assert "http://x.org/zz" in got

    def test_annotate_keeps_all_rows(self, spark, robots_df):
        pages = spark.createDataFrame(
            [("http://x.org/private/a",), ("http://x.org/ok",)],
            "url string",
        )
        rows = {
            r.url: r.robots_allowed
            for r in robots_filter(pages, robots_df, annotate=True).collect()
        }
        assert rows == {
            "http://x.org/private/a": False,
            "http://x.org/ok": True,
        }

    def test_agent_specific(self, spark, robots_df):
        pages = spark.createDataFrame(
            [("http://x.org/zz/page",)], "url string"
        )
        assert robots_filter(pages, robots_df, user_agent="B").count() == 0
        assert robots_filter(pages, robots_df, user_agent="a").count() == 1


class TestCrawlFrontier:
    def test_min_depth_cycle_diamond_island(self, spark):
        edges = spark.createDataFrame(
            [
                ("a", "b"),
                ("b", "c"),
                ("c", "a"),  # cycle back to the seed
                ("a", "d"),
                ("b", "d"),  # diamond: d first reachable at depth 1
                ("d", "e"),
                ("z", "q"),  # island, unreachable
            ],
            "src string, dst string",
        )
        out, stats = crawl_frontier(
            edges, ["a"], max_depth=3, normalize=False, with_stats=True
        )
        rows = {r.url: r.depth for r in out.collect()}
        assert rows == {"a": 0, "b": 1, "d": 1, "c": 2, "e": 2}
        assert stats["total_discovered"] == 5
        assert stats["total_visited"] == 5
        # skipped occurrences: c->a (known), b->d (already found via a)
        assert stats["total_skipped"] == 2

    def test_max_depth_bound(self, spark):
        edges = spark.createDataFrame(
            [("n%d" % i, "n%d" % (i + 1)) for i in range(6)],
            "src string, dst string",
        )
        out, _ = crawl_frontier(edges, ["n0"], max_depth=2, normalize=False)
        assert {r.url: r.depth for r in out.collect()} == {
            "n0": 0,
            "n1": 1,
            "n2": 2,
        }

    def test_normalization_collapses_variants(self, spark):
        # fragment + case variants of the same page must not be
        # re-discovered (url_manager.py:57-85 normalize-before-dedup)
        edges = spark.createDataFrame(
            [
                ("http://s.org/a", "http://s.org/B#frag"),
                ("http://s.org/b", "http://S.ORG/A"),
                ("http://s.org/b", "http://s.org/c"),
            ],
            "src string, dst string",
        )
        out, stats = crawl_frontier(
            edges, ["http://s.org/a"], max_depth=4, with_stats=True
        )
        rows = {r.url: r.depth for r in out.collect()}
        assert rows == {
            "http://s.org/a": 0,
            "http://s.org/b": 1,
            "http://s.org/c": 2,
        }
        assert stats["total_skipped"] == 1  # b -> A variant of the seed

    def test_multiple_seeds_and_empty_frontier(self, spark):
        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        out, stats = crawl_frontier(
            edges, ["a", "x"], max_depth=5, normalize=False
        )
        assert {r.url: r.depth for r in out.collect()} == {
            "a": 0,
            "x": 0,
            "b": 1,
        }
        # loop exits on the first empty wave, not at max_depth
        assert stats["waves"] <= 3


def _page(i, links, domain="site.org", n_rep=4):
    body = "sufficiently long body text for the crawler to keep. " * n_rep
    ahtml = "".join('<a href="%s">l</a>' % l for l in links)
    return (
        "http://%s/p%d" % (domain, i),
        "<html><head><title>Page %d</title></head><body><p>%s</p>%s"
        "</body></html>" % (i, body, ahtml),
    )


@pytest.fixture(scope="module")
def crawl_store(spark):
    rows = [
        _page(0, ["/p1", "/p2", "http://other.org/x", "#f", "mailto:a@b"]),
        _page(1, ["/p3", "/p0"]),
        _page(2, ["/p4", "/missing"]),
        _page(3, []),
        _page(4, ["/p5"]),  # robots-blocked below -> p5 unreachable
        (
            "http://site.org/p5",
            '<html><body><p>short but above fifty characters of text!</p>'
            '<a href="/p6">l</a></body></html>',
        ),
        _page(6, []),
    ]
    return spark.createDataFrame(rows, "url string, html string")


@pytest.fixture(scope="module")
def crawl_robots(spark):
    return spark.createDataFrame(
        [("site.org", "User-agent: *\nDisallow: /p4\n")],
        "domain string, robots_txt string",
    )


class TestCrawl:
    def test_full_loop(self, spark, crawl_store, crawl_robots):
        pages, stats = crawl(
            crawl_store,
            ["http://site.org/p0"],
            robots=crawl_robots,
            max_depth=4,
            min_article_length=60,
            with_stats=True,
        )
        rows = sorted(
            (r.url, r.depth) for r in pages.select("url", "depth").collect()
        )
        assert rows == [
            ("http://site.org/p0", 0),
            ("http://site.org/p1", 1),
            ("http://site.org/p2", 1),
            ("http://site.org/p3", 2),
        ]
        # p4 robots-blocked (visited, failed, links dropped -> p5 never
        # discovered); /missing not in store -> failed fetch at wave 2
        assert stats["pages_collected"] == 4
        assert stats["failed_robots"] == 1
        assert stats["failed_fetch"] == 1
        assert stats["failed_short"] == 0
        assert stats["total_discovered"] == 6  # p0..p4 + /missing
        assert stats["total_visited"] == 6

    def test_short_pages_links_not_followed(self, spark, crawl_store):
        # without robots, p4 -> p5 is reachable; p5's content is under
        # the gate so p6 must NOT be discovered and p5 not collected
        pages, stats = crawl(
            crawl_store,
            ["http://site.org/p0"],
            max_depth=6,
            min_article_length=60,
            with_stats=True,
        )
        urls = {r.url for r in pages.select("url").collect()}
        assert "http://site.org/p5" not in urls
        assert "http://site.org/p6" not in urls
        assert "http://site.org/p4" in urls
        assert stats["failed_short"] == 1

    def test_max_pages_cap_deterministic(self, spark, crawl_store):
        pages, stats = crawl(
            crawl_store,
            ["http://site.org/p0"],
            max_depth=6,
            max_pages=2,
            min_article_length=60,
        )
        # wave 0 collects p0; wave 1 has p1 and p2 but only one slot:
        # the cut is by sorted url -> p1 kept, and the loop stops
        assert sorted(r.url for r in pages.select("url").collect()) == [
            "http://site.org/p0",
            "http://site.org/p1",
        ]
        assert stats["pages_collected"] == 2

    def test_depth_zero_collects_only_seeds(self, spark, crawl_store):
        pages, stats = crawl(
            crawl_store,
            ["http://site.org/p0", "http://site.org/p3"],
            max_depth=0,
            min_article_length=60,
        )
        assert sorted(r.url for r in pages.select("url").collect()) == [
            "http://site.org/p0",
            "http://site.org/p3",
        ]
        assert stats["waves"] == 1

    def test_parse_columns_present(self, spark, crawl_store):
        pages, _ = crawl(
            crawl_store,
            ["http://site.org/p3"],
            max_depth=0,
            min_article_length=60,
        )
        row = pages.collect()[0]
        assert row.title == "Page 3"
        assert row.source in ("generic", "wikipedia", "habr", "stackoverflow")
        assert isinstance(row.links, list)
        assert row.depth == 0


class TestCategorySeeds:
    def test_direct_and_subcats(self, spark):
        membership = spark.createDataFrame(
            [
                ("http://w/p1", "Science"),
                ("http://w/p2", "Science"),
                ("Category:Physics", "Science"),
                ("Category:Biology", "Science"),
                ("http://w/p3", "Physics"),
                ("http://w/p4", "Biology"),
                ("http://w/p5", "Chemistry"),  # not a subcat of Science
                ("http://w/p1", "Physics"),  # dup across categories
            ],
            "url string, category string",
        )
        got = sorted(
            r.url
            for r in wikipedia_category_seeds(membership, "Science").collect()
        )
        assert got == [
            "http://w/p1",
            "http://w/p2",
            "http://w/p3",
            "http://w/p4",
        ]
        direct_only = sorted(
            r.url
            for r in wikipedia_category_seeds(
                membership, "Science", include_subcats=False
            ).collect()
        )
        assert direct_only == ["http://w/p1", "http://w/p2"]

    def test_subcat_cap(self, spark):
        rows = [("Category:C%02d" % i, "Top") for i in range(15)]
        rows += [("http://w/c%02d" % i, "C%02d" % i) for i in range(15)]
        membership = spark.createDataFrame(rows, "url string, category string")
        got = sorted(
            r.url
            for r in wikipedia_category_seeds(
                membership, "Top", max_subcats=10
            ).collect()
        )
        # lexical order -> C00..C09 kept, C10..C14 beyond the cap
        assert got == ["http://w/c%02d" % i for i in range(10)]


class TestPlanShape:
    def test_robots_filter_broadcasts_compiled_rules(self, spark, robots_df):
        """The compiled per-domain rules must broadcast (the page side
        is the corpus); the prefix test is JVM-side, so exactly one
        Python eval node (the domain-table compile UDF) may appear."""
        pages = spark.range(200).select(
            F.concat(
                F.lit("http://x.org/p"), F.col("id").cast("string")
            ).alias("url")
        )
        out = robots_filter(pages, robots_df)
        out.collect()  # AQE finalizes the join strategy at runtime
        plan = out._jdf.queryExecution().executedPlan().toString()
        # keep only the FINAL adaptive plan (the trailing "Initial
        # Plan" section retains the pre-AQE sort-merge skeleton)
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("BroadcastHashJoin") == 1
        assert "SortMergeJoin" not in final
        n_py = final.count("ArrowEvalPython") + final.count("BatchEvalPython")
        assert n_py == 1


class TestReviewFindings:
    def test_null_dst_edges_dropped(self, spark):
        """A null dst must not be re-discovered every wave: null keys
        never match in the anti-join, so an unfiltered null row would
        inflate stats and suppress the empty-frontier early exit."""
        edges = spark.createDataFrame(
            [("a", "b"), ("a", None), ("b", None)],
            "src string, dst string",
        )
        out, stats = crawl_frontier(
            edges, ["a"], max_depth=5, normalize=False, with_stats=True
        )
        rows = {r.url: r.depth for r in out.collect()}
        assert rows == {"a": 0, "b": 1}
        assert stats["total_discovered"] == 2
        assert stats["waves"] <= 3

    def test_duplicate_robots_rows_do_not_fan_out(self, spark):
        """Two robots rows for one domain must not duplicate pages
        through the join (the compile dedupes to min body per domain)."""
        pages = spark.createDataFrame(
            [("http://x.org/a/1",), ("http://x.org/b/1",)], "url string"
        )
        robots = spark.createDataFrame(
            [
                ("x.org", "User-agent: *\nDisallow: /a"),
                ("x.org", "User-agent: *\nDisallow: /b"),
            ],
            "domain string, robots_txt string",
        )
        out = robots_filter(pages, robots).collect()
        # min body wins -> '/a' disallowed, '/b' allowed, ONE row each
        assert sorted(r.url for r in out) == ["http://x.org/b/1"]
        annotated = robots_filter(pages, robots, annotate=True).collect()
        assert len(annotated) == 2

"""URL canonicalization + URL-grain dedup (operators/urls.py)."""

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import urls

CASES = [
    # (raw, expected canonical) — each exercises one RFC 3986 §6
    # equivalence or one pipeline-specific normalization
    ("HTTP://Site3.Example:80/path/9?id=9", "http://site3.example/path/9?id=9"),
    (
        "https://www.example.com:443/a/b/?utm_source=x&b=2&a=1#frag",
        "https://example.com/a/b?a=1&b=2",
    ),
    ("http://example.com/", "http://example.com"),
    ("http://example.com//a//b", "http://example.com/a/b"),
    # non-default ports survive
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    (":443 is not http's default", None),  # malformed: no scheme
    ("https://example.com:80/x", "https://example.com:80/x"),
    # tracking-only query drops the '?' entirely
    ("http://e.com/p?utm_campaign=c&fbclid=z", "http://e.com/p"),
    ("http://e.com/p?", "http://e.com/p"),
    # bare (no '=') params sort with the rest
    ("http://e.com/p?flag&a=1", "http://e.com/p?a=1&flag"),
    # utm must match as a PREFIX of the key, not anywhere in the param
    ("http://e.com/p?a=utm_x", "http://e.com/p?a=utm_x"),
    # userinfo drops; the path offset must not shift (regression: the
    # slice base is the RAW authority length, not the stripped host's)
    ("http://User:Pw@Example.com:80/x?b=1", "http://example.com/x?b=1"),
    # tracking detection is case-insensitive; kept params keep case
    ("http://e.com/p?UTM_SOURCE=x&B=2", "http://e.com/p?B=2"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)], "i int, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", urls.canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_url_dedup_decisions_groups_and_keepers(spark):
    rows = [
        (1, "HTTP://A.com:80/x?id=1"),   # group a: two spellings
        (2, "http://a.com/x/?id=1&utm_source=s#f"),
        (3, "http://b.com/solo"),        # singleton
        (4, "no scheme here"),           # malformed -> NULL group of 1, kept
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    out = {
        r["doc_id"]: r
        for r in urls.url_dedup_decisions(df, "url", "doc_id").collect()
    }
    assert out[1]["canonical_url"] == out[2]["canonical_url"] == "http://a.com/x?id=1"
    assert out[1]["keep"] and not out[2]["keep"]
    assert out[1]["group_size"] == out[2]["group_size"] == 2
    assert out[3]["keep"] and out[3]["group_size"] == 1
    assert out[4]["canonical_url"] is None
    assert out[4]["keep"] and out[4]["group_size"] == 1


def test_url_dedup_is_agg_join_not_window(spark):
    """Scale contract: the verdict comes from a hash-groupBy (map-side
    partial combine absorbs hot-URL skew) joined back — never a window
    over the canonical key, which would buffer whole hot groups in one
    task."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://h.com/p/"), (F.col("id") % 10).cast("string")).alias("url"),
    )
    plan = urls.url_dedup_decisions(df, "url", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_canonical_url_is_idempotent_over_component_grid(spark):
    """Canonicalization must be a FIXED POINT: canonical(canonical(u)) ==
    canonical(u), or re-canonicalizing stored canonical URLs (exactly what
    an incremental pipeline does on every batch) would split dedup groups.
    One Spark job over the full component grid: scheme case x userinfo x
    host case/www x port x path slashes x param order/tracking x
    fragment = 768 combinations."""
    from itertools import product

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls

    rows = []
    for scheme, user, host, port, path, query, frag in product(
        ["http", "HTTPS"],
        ["", "u:p@"],
        ["Example.com", "www.example.COM"],
        ["", ":80", ":443", ":8080"],
        ["/", "/a//b/", "/a/b"],
        ["", "?utm_source=x", "?b=2&a=1&gclid=z", "?a=1"],
        ["", "#frag"],
    ):
        rows.append((f"{scheme}://{user}{host}{port}{path}{query}{frag}",))
    df = spark.createDataFrame(rows, "url string")
    out = df.select(
        urls.canonical_url(F.col("url")).alias("c1")
    ).select(
        "c1", urls.canonical_url(F.col("c1")).alias("c2")
    )
    bad = out.filter(
        F.col("c1").isNull() | (F.col("c1") != F.col("c2"))
    ).collect()
    assert not bad, bad[:5]


ROBOTS = [
    ("a.com", "User-agent: *\nDisallow: /\n"),
    (
        "b.com",
        "# policy\nUser-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "\nUser-agent: graftbot\nDisallow: /page\n",
    ),
    # stacked agents share one rule group
    ("c.com", "User-agent: graftbot\nUser-agent: otherbot\nDisallow: /x\nAllow: /x/y\n"),
    ("d.com", "User-agent: otherbot\nDisallow: /\n"),
]


def test_parse_robots_groups_and_stacked_agents(spark):
    from practicum2_nof1_adhd_bd_spark.operators import urls

    df = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    rules = {
        (r["host"], r["agent"], r["prefix"]): r["allow"]
        for r in urls.parse_robots(df).collect()
    }
    assert rules[("a.com", "*", "/")] is False
    assert rules[("b.com", "*", "/private")] is False
    assert rules[("b.com", "*", "/private/ok")] is True
    assert rules[("b.com", "graftbot", "/page")] is False
    # stacked agents: both carry the group's rules
    assert rules[("c.com", "graftbot", "/x")] is False
    assert rules[("c.com", "otherbot", "/x/y")] is True
    assert ("b.com", "graftbot", "/private") not in rules  # group isolation


def test_robots_screen_longest_match_and_group_selection(spark):
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls

    robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    cases = {
        "http://a.com/anything": False,     # blanket * disallow
        # group selection is EXCLUSIVE (REP): b.com has an exact
        # graftbot group, so the * group's /private rules never apply —
        # only /page is disallowed for this agent
        "http://b.com/private/z": True,
        "http://b.com/page/1": False,
        "http://b.com/other": True,
        "http://b.com/private/ok/2": True,
        "http://c.com/x/z": False,          # stacked-agent group
        "http://c.com/x/y/3": True,         # longest match: Allow /x/y
        "http://d.com/w": True,             # no matching group at all
        "http://nobots.example/p": True,    # host without robots
        # userinfo/port must not defeat host keying (regression: a
        # [^@]-less capture would match the userinfo as the host)
        "http://u:p@a.com:8080/q": False,
    }
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "doc_id int, url string"
    )
    out = {
        r["url"]: r["crawlable"]
        for r in urls.robots_screen(df, robots, agent="GraftBot").collect()
    }
    assert out == cases
    # plan contract: the rules side broadcasts; the crawl never shuffles
    plan = urls.robots_screen(df, robots)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_crawl_delays_selection_table(spark):
    """REP exclusive-group delay selection: exact agent group wins when
    it declares a delay; an exact group WITHOUT a delay still shadows
    the * group's delay (default applies); no declaration or an
    unparsable value falls back to the default; multiple delay lines in
    the selected group take the max."""
    from practicum2_nof1_adhd_bd_spark.operators import urls

    robots = spark.createDataFrame(
        [
            ("star.com", "User-agent: *\nCrawl-delay: 7\n"),
            (
                "exact.com",
                "User-agent: *\nCrawl-delay: 10\n\n"
                "User-agent: graftbot\nCrawl-delay: 2\n",
            ),
            (
                "shadow.com",
                "User-agent: graftbot\nDisallow: /q\n\n"
                "User-agent: *\nCrawl-delay: 9\n",
            ),
            ("none.com", "User-agent: *\nDisallow: /tmp\n"),
            ("bad.com", "User-agent: *\nCrawl-delay: soon\n"),
            (
                "multi.com",
                "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 8\n",
            ),
        ],
        "host string, robots_txt string",
    )
    out = {
        r["host"]: r["crawl_delay"]
        for r in urls.crawl_delays(robots, "graftbot", 1.5).collect()
    }
    assert out == {
        "star.com": 7.0,
        "exact.com": 2.0,
        "shadow.com": 1.5,
        "none.com": 1.5,
        "bad.com": 1.5,
        "multi.com": 8.0,
    }


def test_crawl_frontier_bounded_by_horizon_and_priority_order(spark):
    """Slots assign by (priority desc, url asc) per host; only slots
    inside the horizon emit; unknown hosts (no robots row) get the
    default delay."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls

    u = spark.createDataFrame(
        [
            ("http://slow.com/a", 1),
            ("http://slow.com/b", 9),
            ("http://slow.com/c", 9),
            ("http://mystery.com/x", 5),
            ("http://mystery.com/y", 4),
        ],
        "url string, priority int",
    )
    robots = spark.createDataFrame(
        [("slow.com", "User-agent: *\nCrawl-delay: 6\n")],
        "host string, robots_txt string",
    )
    rows = {
        r["url"]: r
        for r in urls.crawl_frontier(
            u, robots, "graftbot", default_delay=2.0, horizon_s=12.0
        ).collect()
    }
    # slow.com: b (prio 9) slot 0, c (prio 9, url tie-break) slot 1 at
    # 6s; a (prio 1) slot 2 = 12s — outside the 12s horizon, dropped
    assert set(rows) == {
        "http://slow.com/b", "http://slow.com/c",
        "http://mystery.com/x", "http://mystery.com/y",
    }
    assert rows["http://slow.com/b"]["slot"] == 0
    assert rows["http://slow.com/c"]["fetch_at_s"] == 6.0
    assert rows["http://mystery.com/x"]["crawl_delay"] == 2.0
    assert rows["http://mystery.com/y"]["fetch_at_s"] == 2.0
    # plan contract: the delay dim broadcasts
    plan = (
        urls.crawl_frontier(u, robots)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_crawl_frontier_fragment_only_url_keys_host(spark):
    """A path-less URL with a fragment (http://a.com#x) must key on the
    bare host: the '#'-terminated authority capture (r13 ADVICE) keeps
    the fragment out of the host, so the robots delay join lands and
    the URL shares its host's politeness clock."""
    from practicum2_nof1_adhd_bd_spark.operators import urls

    u = spark.createDataFrame(
        [("http://slow.com#frag", 9), ("http://slow.com/a", 1)],
        "url string, priority int",
    )
    robots = spark.createDataFrame(
        [("slow.com", "User-agent: *\nCrawl-delay: 6\n")],
        "host string, robots_txt string",
    )
    rows = {
        r["url"]: r
        for r in urls.crawl_frontier(
            u, robots, "graftbot", default_delay=1.0, horizon_s=100.0
        ).collect()
    }
    assert rows["http://slow.com#frag"]["host"] == "slow.com"
    assert rows["http://slow.com#frag"]["crawl_delay"] == 6.0
    # same host clock: the fragment URL (prio 9) takes slot 0, /a slot 1
    assert rows["http://slow.com#frag"]["slot"] == 0
    assert rows["http://slow.com/a"]["fetch_at_s"] == 6.0
    # robots_screen keys the same way: the fragment URL matches its
    # host's rules (path defaults to "/")
    screened = {
        r["url"]: r["crawlable"]
        for r in urls.robots_screen(
            u,
            spark.createDataFrame(
                [("slow.com", "User-agent: *\nDisallow: /\n")],
                "host string, robots_txt string",
            ),
            "graftbot",
        ).collect()
    }
    assert screened["http://slow.com#frag"] is False


def test_crawl_frontier_mega_host_bounded_and_exact(spark):
    """One host holding ~90% of the candidate backlog (the skew case the
    salted pre-rank bound exists for, r13 verdict #2): the schedule must
    be IDENTICAL to the unbounded definition — top ceil(horizon/delay)
    by (priority desc, url asc) per host — while the final per-host
    window only ever ranks the salted survivors, never the backlog."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls

    n_big = 900
    big = spark.range(n_big).select(
        F.concat(F.lit("http://big.com/p"), F.col("id")).alias("url"),
        ((F.col("id") * 13) % 97).cast("int").alias("priority"),
    )
    small = spark.range(100).select(
        F.concat(F.lit("http://tiny.org/q"), F.col("id")).alias("url"),
        F.lit(1).cast("int").alias("priority"),
    )
    u = big.unionByName(small).repartition(8)
    robots = spark.createDataFrame(
        [("big.com", "User-agent: *\nCrawl-delay: 2\n")],
        "host string, robots_txt string",
    )
    out = urls.crawl_frontier(
        u, robots, "graftbot", default_delay=1.0, horizon_s=10.0
    ).collect()
    # big.com: delay 2, horizon 10 -> slots 0..4 (5 rows);
    # tiny.org: delay 1 -> slots 0..9 (10 rows)
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["big.com"]) == 5
    assert len(by_host["tiny.org"]) == 10
    # replay the unbounded definition driver-side for big.com
    cand = sorted(
        (-((i * 13) % 97), f"http://big.com/p{i}") for i in range(n_big)
    )[:5]
    exp_urls = [url for _, url in cand]
    got = sorted(by_host["big.com"], key=lambda r: r["slot"])
    assert [r["url"] for r in got] == exp_urls
    assert [r["fetch_at_s"] for r in got] == [0.0, 2.0, 4.0, 6.0, 8.0]


def test_crawl_frontier_zero_delay_keeps_every_candidate(spark):
    """Crawl-delay 0 means every slot fits the horizon: the pre-rank cap
    must not apply (no division by zero, no dropped rows)."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls

    u = spark.range(50).select(
        F.concat(F.lit("http://zero.net/"), F.col("id")).alias("url"),
        F.lit(1).cast("int").alias("priority"),
    )
    robots = spark.createDataFrame(
        [("zero.net", "User-agent: *\nCrawl-delay: 0\n")],
        "host string, robots_txt string",
    )
    out = urls.crawl_frontier(u, robots, "graftbot", horizon_s=5.0)
    assert out.count() == 50

"""URL canonicalization + URL-grain dedup (brief §"Beyond").

The first screen of every crawl-curation pipeline: before any content
hashing, collapse the many spellings of the same resource — scheme/host
case, default ports, `www.` prefixes, fragments, tracking query
parameters, parameter order, duplicate/trailing slashes — onto ONE
canonical string, then dedup at that grain. CCNet/RefinedWeb-style
pipelines run this URL dedup ahead of MinHash because it is pure column
algebra on a short string: no shingling, no signature, no pair join.

Design for 100 TB:

- ``canonical_url`` is a single codegen'd expression tree (regexp + array
  ops on the split query string) — it runs inside the scan's
  WholeStageCodegen span, shuffles nothing, and never leaves the JVM.
- ``url_dedup_decisions`` aggregates (min id, count) per canonical URL
  with a hash-groupBy FIRST — map-side partial aggregation collapses hot
  URLs (the canonical example of key skew: a popular page crawled
  millions of times) before anything shuffles — and then joins the tiny
  per-URL verdict back to the rows. A window over the canonical key
  would shuffle EVERY row and buffer entire hot groups in one task; the
  agg+join shape leaves hot-key splitting to AQE's skew join instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query-string keys that identify a CLICK, not a resource (the UTM tag
# set plus the common platform click ids) — dropped during
# canonicalization the way url-normalization layers in crawl pipelines
# (and the public tracking-param blocklists they embed) do.
TRACKING_KEYS = (
    "fbclid", "gclid", "dclid", "msclkid", "mc_cid", "mc_eid",
    "igshid", "ref", "ref_src", "spm", "_ga",
)
TRACKING_PREFIXES = ("utm_",)


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute URL as one codegen'd expression.

    Steps (each a documented URL equivalence, RFC 3986 §6):
    scheme + host lowercase; userinfo (``user:pw@``) dropped — crawlers
    dedup the resource, not the credential; default port stripped (:80
    http, :443 https); leading ``www.`` stripped; fragment dropped;
    duplicate path slashes collapsed and trailing slashes stripped (root
    path becomes empty); tracking query params dropped (``utm_*`` + the
    click-id set), remaining params sorted bytewise and re-joined.
    Non-absolute input (no ``scheme://``) canonicalizes to NULL so
    malformed rows are countable instead of silently passing through.
    Out of scope (documented boundary): percent-encoding normalization
    and IDN/punycode folding — both need a decoder, not column algebra.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(
        F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""), r"#.*$", ""
    )
    # raw authority keeps its original length: path_q slices rest at
    # length(rawauth), so userinfo must be stripped AFTER the slice base
    # is fixed, never from the string the offset is measured on
    rawauth = F.regexp_extract(rest, r"^([^/?]+)", 1)
    hostport = F.lower(F.regexp_replace(rawauth, r"^[^@]*@", ""))
    host = (
        F.when(
            (scheme == F.lit("http")) & hostport.rlike(":80$"),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            (scheme == F.lit("https")) & hostport.rlike(":443$"),
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path_q = rest.substr(F.length(rawauth) + 1, F.length(rest))
    path = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(path_q, r"^([^?]*)", 1), r"/{2,}", "/"),
        r"/+$",
        "",
    )
    raw_params = F.split(F.regexp_extract(path_q, r"\?(.*)$", 1), "&")

    def _keep(p: Column) -> Column:
        # tracking detection is case-insensitive (UTM_SOURCE tracks the
        # same click utm_source does); the kept params keep their case
        key = F.lower(F.regexp_extract(p, r"^([^=]*)", 1))
        cond = p != F.lit("")
        for pref in TRACKING_PREFIXES:
            cond = cond & ~key.startswith(pref)
        return cond & ~key.isin(*TRACKING_KEYS)

    qstr = F.array_join(F.array_sort(F.filter(raw_params, _keep)), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qstr != F.lit(""), F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == F.lit(""), F.lit(None).cast("string")).otherwise(canon)


def _robots_runs(
    robots_df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """Typed robots.txt lines with their agent-group run ids: ``(host,
    pos, kind, val, run_id)`` where kind in (agent, disallow, allow,
    delay). A line belongs to the nearest preceding RUN of consecutive
    ``User-agent`` lines — recovered distributively: posexplode the
    lines, flag agent-run STARTS (an agent line whose previous line
    isn't one, via lag), running-sum the flags into a run id (the
    gaps-and-islands device). All windows partition by host: robots
    files are bounded (hundreds of lines), so per-host state never
    grows with the corpus."""
    from pyspark.sql import Window

    lines = robots_df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "_l"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("_l", r"#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    kind = (
        F.when(F.lower("line").rlike(r"^user-agent\s*:"), F.lit("agent"))
        .when(F.lower("line").rlike(r"^disallow\s*:"), F.lit("disallow"))
        .when(F.lower("line").rlike(r"^allow\s*:"), F.lit("allow"))
        .when(F.lower("line").rlike(r"^crawl-delay\s*:"), F.lit("delay"))
    )
    val = F.trim(F.regexp_extract("line", r":(.*)$", 1))
    w = Window.partitionBy("host").orderBy("pos")
    typed = lines.select(
        "host", "pos", kind.alias("kind"), val.alias("val")
    ).filter(F.col("kind").isNotNull())
    return typed.withColumn(
        "_new_run",
        (
            (F.col("kind") == "agent")
            & (F.coalesce(F.lag("kind").over(w), F.lit("")) != "agent")
        ).cast("int"),
    ).withColumn("run_id", F.sum("_new_run").over(w))


def parse_robots(
    robots_df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies to rule rows: ``(host, agent, allow,
    prefix, prefix_len)`` — one row per (agent, rule) pair, agents
    lowercased, empty-prefix rules dropped (an empty ``Disallow:`` means
    allow-everything, i.e. no rule).

    Group structure is positional — a rule belongs to the nearest
    preceding RUN of consecutive ``User-agent`` lines — recovered
    distributively: posexplode the lines, flag agent-run STARTS (an
    agent line whose previous line isn't one, via lag), running-sum the
    flags into a run id (the gaps-and-islands device), then join rules
    to their run's agents. All windows partition by host: robots files
    are bounded (hundreds of lines), so per-host state never grows with
    the corpus. Prefix matching downstream is literal (original REP);
    the ``*``/``$`` wildcard extension is a documented non-goal."""
    runs = _robots_runs(robots_df, host_col, txt_col)
    agents = (
        runs.filter(F.col("kind") == "agent")
        .select("host", "run_id", F.lower("val").alias("agent"))
        .distinct()
    )
    rules = runs.filter(
        F.col("kind").isin("allow", "disallow") & (F.col("val") != "")
        & (F.col("run_id") > 0)
    ).select(
        "host",
        "run_id",
        (F.col("kind") == "allow").alias("allow"),
        F.col("val").alias("prefix"),
        F.length("val").alias("prefix_len"),
    )
    return rules.join(agents, ["host", "run_id"]).select(
        "host", "agent", "allow", "prefix", "prefix_len"
    )


def robots_screen(
    urls_df: DataFrame,
    robots_df: DataFrame,
    agent: str = "graftbot",
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Per-URL crawl-permission verdict under the REP longest-match rule:
    pick the host's most specific agent group (exact agent name if it
    has one, else ``*``), match the URL path against that group's
    prefixes, and let the LONGEST matching prefix decide — tie goes to
    Allow; no match (or no robots) means crawlable.

    Scale shape: robots rules are a dim (one bounded file per host vs a
    100-TB crawl) — the parsed rules BROADCAST, the path-prefix match is
    a broadcast theta-join, and the winner per URL is one hash-groupBy
    max over (prefix_len, allow). The crawl never shuffles."""
    rules = parse_robots(robots_df, host_col, txt_col)
    a = F.lit(agent.lower())
    has_exact = rules.groupBy("host").agg(
        F.max((F.col("agent") == a).cast("int")).alias("_he")
    )
    grp = (
        rules.join(has_exact, "host")
        .filter(
            ((F.col("_he") == 1) & (F.col("agent") == a))
            | ((F.col("_he") == 0) & (F.col("agent") == "*"))
        )
        .select(
            F.col("host").alias("_rhost"), "allow", "prefix", "prefix_len"
        )
    )
    raw_path = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://[^/]+(/.*)$", 1)
    # authority first, then strip userinfo and port — a bare
    # "[^/:?@]+" capture would stop BEFORE the @ and mis-key
    # user@host URLs on the userinfo; the capture must also stop at
    # '#': a path-less URL with a fragment (http://a.com#x) would
    # otherwise keep the fragment in the host and miss the robots join
    auth = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/?#]+)", 1)
    u = urls_df.withColumn(
        "_path", F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    ).withColumn(
        "_host",
        F.lower(
            F.regexp_replace(
                F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+$", ""
            )
        ),
    )
    m = u.join(
        F.broadcast(grp),
        (F.col("_host") == F.col("_rhost"))
        & F.col("_path").startswith(F.col("prefix")),
        "left",
    )
    # Restore the input grain by grouping on ALL input columns — rows
    # that were distinct stay distinct even when their URLs coincide
    # (fully identical rows collapse, which is the only honest answer a
    # set-semantics aggregation can give them).
    return (
        m.groupBy(*urls_df.columns)
        .agg(
            F.max(
                F.when(
                    F.col("prefix_len").isNotNull(),
                    F.struct(
                        F.col("prefix_len").alias("l"),
                        F.col("allow").cast("int").alias("a"),
                    ),
                )
            ).alias("_win"),
        )
        .withColumn(
            "crawlable", F.coalesce(F.col("_win.a") == 1, F.lit(True))
        )
        .drop("_win")
    )


def crawl_delays(
    robots_df: DataFrame,
    agent: str = "graftbot",
    default_delay: float = 1.0,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Per-host effective ``Crawl-delay`` for ``agent`` under REP's
    exclusive-group rule: if ANY group on the host names the exact
    agent, only that group's declarations apply (a ``*`` group's delay
    is shadowed even when the exact group declares none — the same
    shadowing robots_screen proves for rules); otherwise the ``*``
    group's delay applies; a host with no applicable declaration (or an
    unparsable value — try_cast) falls back to ``default_delay``.
    Multiple delay lines in the selected group take the MAX (the polite
    reading, and deterministic). Returns ``(host, crawl_delay)`` — one
    bounded row per host, a broadcastable dim at any crawl size."""
    runs = _robots_runs(robots_df, host_col, txt_col)
    a = F.lit(agent.lower())
    agents = (
        runs.filter(F.col("kind") == "agent")
        .select("host", "run_id", F.lower("val").alias("agent"))
        .distinct()
    )
    has_exact = agents.groupBy("host").agg(
        F.max((F.col("agent") == a).cast("int")).alias("_he")
    )
    delays = (
        runs.filter(F.col("kind") == "delay")
        .select(
            "host", "run_id", F.expr("try_cast(val AS DOUBLE)").alias("_d")
        )
        .filter(F.col("_d").isNotNull() & (F.col("_d") >= 0))
    )
    selected = (
        delays.join(agents, ["host", "run_id"])
        .join(has_exact, "host")
        .filter(
            ((F.col("_he") == 1) & (F.col("agent") == a))
            | ((F.col("_he") == 0) & (F.col("agent") == "*"))
        )
        .groupBy("host")
        .agg(F.max("_d").alias("_delay"))
    )
    # every robots host gets a row (declared delay or the default), so
    # the frontier join below can distinguish "no robots" from "robots
    # without a delay" only if the caller cares — both land on default
    hosts = robots_df.select(F.col(host_col).alias("host")).distinct()
    return hosts.join(selected, "host", "left").select(
        "host",
        F.coalesce("_delay", F.lit(float(default_delay))).alias(
            "crawl_delay"
        ),
    )


def crawl_frontier(
    urls_df: DataFrame,
    robots_df: DataFrame,
    agent: str = "graftbot",
    url_col: str = "url",
    priority_col: str = "priority",
    default_delay: float = 1.0,
    horizon_s: float = 60.0,
    robots_host_col: str = "host",
    robots_txt_col: str = "robots_txt",
) -> DataFrame:
    """Per-host politeness frontier — the scheduling step between the
    robots permission screen and the fetcher: each candidate URL gets a
    fetch slot on its host's clock, ``fetch_at_s = slot *
    crawl_delay``, slots assigned by (priority DESC, url ASC) rank so
    the highest-priority URLs fetch first and ties are deterministic.
    Only slots inside ``horizon_s`` are emitted, so the OUTPUT is
    bounded by hosts * (horizon / delay) — it scales with the number of
    hosts, never with the size of the candidate list (the property that
    makes a 100-TB frontier plannable per scheduling wave; URLs that
    miss the horizon simply re-enter the next wave's candidate set).

    Plan shape: crawl_delays is a per-host dim that BROADCASTS into the
    candidate side. Only ranks <= ceil(horizon / delay) can survive the
    horizon filter, so a salted PRE-RANK top-K bounds the final window:
    phase 1 ranks within (host, salt-of-url) sub-partitions — a
    mega-host's backlog sort is spread over ``n_salts`` tasks, each
    sorting backlog/n_salts rows — and keeps only sub-rank <= cap
    (exact: every global top-cap row is within the top-cap of its own
    salt bucket). Phase 2's per-host window then ranks at most
    n_salts * cap rows per host — bounded by the horizon, never by the
    backlog. Two exchanges instead of one, but neither sorts a
    mega-host's entire candidate list."""
    delays = crawl_delays(
        robots_df, agent, default_delay, robots_host_col, robots_txt_col
    )
    return frontier_schedule(
        urls_df, delays, url_col, priority_col, default_delay, horizon_s
    )


def frontier_schedule(
    urls_df: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    default_delay: float = 1.0,
    horizon_s: float = 60.0,
) -> DataFrame:
    """The scheduling half of ``crawl_frontier``, taking an
    already-derived ``(host, crawl_delay)`` dim — split out so the
    streaming frontier can collect the bounded dim ONCE at stream start
    and rebuild it per micro-batch instead of re-parsing robots.txt
    every wave. Semantics identical to crawl_frontier (which delegates
    here)."""
    from pyspark.sql import Window

    n_salts = 32
    # host capture stops at '/', '?', AND '#': a path-less URL with a
    # fragment (http://a.com#x) must not keep the fragment in the host —
    # it would miss the robots-delay join and split the politeness clock
    auth = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/?#]+)", 1)
    u = urls_df.withColumn(
        "host",
        F.lower(
            F.regexp_replace(
                F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+$", ""
            )
        ),
    )
    j = u.join(F.broadcast(delays), "host", "left").withColumn(
        "crawl_delay",
        F.coalesce("crawl_delay", F.lit(float(default_delay))),
    )
    # rank r survives iff (r-1) * delay < horizon  =>  r <= ceil(h/d);
    # delay == 0 means every slot fits the horizon — no cap applies
    cap = F.when(
        F.col("crawl_delay") > 0,
        F.ceil(F.lit(float(horizon_s)) / F.col("crawl_delay")),
    )
    wsub = Window.partitionBy("host", "_salt").orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    pre = (
        j.withColumn("_salt", F.crc32(F.col(url_col)) % n_salts)
        .withColumn("_subrank", F.row_number().over(wsub))
        .filter(cap.isNull() | (F.col("_subrank") <= cap))
        .drop("_salt", "_subrank")
    )
    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    return (
        pre.withColumn("slot", F.row_number().over(w) - 1)
        .withColumn(
            "fetch_at_s", F.round(F.col("slot") * F.col("crawl_delay"), 6)
        )
        .filter(F.col("fetch_at_s") < horizon_s)
        .select(
            "host", url_col, priority_col, "slot", "crawl_delay",
            "fetch_at_s",
        )
    )


def url_dedup_decisions(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-row URL-dedup verdict: ``canonical_url``, ``group_size``, and
    ``keep`` (smallest id per canonical group wins — deterministic, so
    re-runs and the DuckDB oracle agree). Rows whose URL fails to
    canonicalize (NULL) are their own group of 1 and kept, so malformed
    URLs are never silently dropped.

    Shuffle budget: one hash-groupBy on the canonical string (partial
    map-side combine absorbs hot-URL skew) + one join of the per-URL
    verdict back to the rows; AQE's skew join splits any residual hot
    key. Nothing buffers a whole group in memory — contrast a window
    over the canonical key, which would.
    """
    canon = df.withColumn("canonical_url", canonical_url(F.col(url_col)))
    groups = (
        canon.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("_keeper"),
            F.count(F.lit(1)).alias("_gsize"),
        )
    )
    return (
        canon.join(groups, "canonical_url", "left")
        .select(
            F.col(id_col),
            "canonical_url",
            F.coalesce(F.col("_gsize"), F.lit(1)).cast("long").alias("group_size"),
            F.coalesce(F.col(id_col) == F.col("_keeper"), F.lit(True)).alias(
                "keep"
            ),
        )
    )

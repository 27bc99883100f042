"""WARC source — the Common Crawl interchange format, the de-facto raw
input of every web-scale pretraining pipeline (brief §"Beyond": sources a
large-scale training-data pipeline needs; same splittable-text-scan family
as the XML record scan, sources/xml_records.py).

A WARC file is a concatenation of records, each ``WARC/1.0\\r\\n`` +
named headers + blank line + payload; ``response`` records wrap an HTTP
message (status line + HTTP headers + blank line + body). The Spark-native
read: text scan with ``lineSep='WARC/1.0'`` so every record becomes one
row and the scan SPLITS ACROSS EXECUTORS (a custom-lineSep text scan is
splittable; split size rides spark.sql.files.maxPartitionBytes), then all
header/payload surgery is codegen'd regexp/substring column algebra — no
Python in the scan path. Real crawls ship gzip *members* per record
(.warc.gz); gzip is not splittable, so production reads the uncompressed
form or per-record members via binaryFile + mapInPandas — this module
implements the splittable plain-WARC path and keeps the record parsing
shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record: warc_type, target_uri, record_id,
    content_length (declared), and the raw record block for downstream
    parsing. Records before the first delimiter (file magic at offset 0
    yields an empty first segment) are dropped by the header filter."""
    raw = spark.read.option("lineSep", "WARC/1.0").text(path)
    rec = raw.filter(F.col("value").contains("WARC-Type:"))
    hdr = lambda name: F.regexp_extract(  # noqa: E731
        F.col("value"), rf"(?m)^{name}:\s*(\S+)", 1
    )
    return rec.select(
        hdr("WARC-Type").alias("warc_type"),
        hdr("WARC-Target-URI").alias("target_uri"),
        hdr("WARC-Record-ID").alias("record_id"),
        hdr("Content-Length").cast("bigint").alias("content_length"),
        F.col("value").alias("_raw"),
    )


def warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """Response records parsed to the columns a curation pipeline keys on:
    record_id (the stable per-record identity — target URIs duplicate
    under recrawls and respellings), target_uri, host, http_status,
    content_type, body (the HTTP payload with both header blocks
    stripped), n_body_chars.

    All parsing is column algebra over the record block: the payload
    starts after the WARC-header blank line (first ``\\r\\n\\r\\n``), the
    HTTP body after the next one; status and content-type come from the
    HTTP preamble. Trailing inter-record CRLFs are trimmed — the WARC spec
    mandates exactly two, but the scan tolerates any run (crawler output
    is never that clean)."""
    rec = read_warc_records(spark, path).filter(
        F.col("warc_type") == "response"
    )
    # Bodies may themselves contain blank lines, so the slicing anchors
    # from the FRONT (substring_index from the back would mis-split):
    # the HTTP message starts after the FIRST blank line (end of WARC
    # headers), the body after the first blank line inside that message.
    http_msg = F.expr(
        "substring(_raw, instr(_raw, '\r\n\r\n') + 4)"
    )
    body = F.expr(
        "substring(substring(_raw, instr(_raw, '\r\n\r\n') + 4), "
        "instr(substring(_raw, instr(_raw, '\r\n\r\n') + 4), "
        "'\r\n\r\n') + 4)"
    )
    status = F.regexp_extract(http_msg, r"^HTTP/[\d.]+\s+(\d{3})", 1).cast(
        "int"
    )
    ctype = F.regexp_extract(
        http_msg, r"(?mi)^Content-Type:\s*([^\r\n;]+)", 1
    )
    host = F.regexp_extract(
        F.col("target_uri"), r"^[a-z]+://([^/]+)", 1
    )
    out_body = F.regexp_replace(body, r"(\r\n)+$", "")
    return rec.select(
        "record_id",
        "target_uri",
        host.alias("host"),
        status.alias("http_status"),
        ctype.alias("content_type"),
        out_body.alias("body"),
        F.length(out_body).alias("n_body_chars"),
    )


def filter_blocklist(
    responses: DataFrame,
    blocked_hosts: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Domain-blocklist screening (the UT1/url-filter step every crawl
    pipeline runs before text extraction): keep = host not in the
    blocklist. The blocklist is a dim (thousands to millions of rows vs a
    100-TB crawl) — broadcast LEFT ANTI join, the fact never shuffles.
    Returns the responses frame with a ``blocked`` flag so callers can
    either filter or report."""
    b = F.broadcast(
        blocked_hosts.select(F.col(host_col).alias("_bh")).distinct()
    )
    return (
        responses.join(
            b, responses[host_col] == F.col("_bh"), "left"
        )
        .withColumn("blocked", F.col("_bh").isNotNull())
        .drop("_bh")
    )


def synthesize_warc(
    path: str, n_records: int = 240, html_bodies: bool = False
) -> None:
    """Deterministic WARC fixture — every field a pure function of the
    record index (the fixture-formula oracle device, like
    zip_ingest/cda): record i is a response unless i % 4 == 3 (request),
    uri http://site{i%7}.example/page/{i}, status 404 when i % 6 == 0
    else 200, and every fifth body carries an EMBEDDED blank line (the
    case that breaks back-anchored payload splits). Written as one plain
    (uncompressed, splittable) .warc file.

    ``html_bodies=True`` is the corpus-pipeline variant: bodies are
    formula-built HTML (title + script + h1 + entity-laden paragraph,
    every fifth page an extra paragraph), and every record with
    i % 8 == 6 is a RESPELLED RECRAWL of page i-2 — uppercase scheme,
    www. prefix, default port — so URL canonicalization has real
    duplicates to collapse downstream."""
    import os

    os.makedirs(path, exist_ok=True)
    out = []
    for i in range(n_records):
        uri = f"http://site{i % 7}.example/page/{i}"
        if html_bodies and i % 4 != 3 and i % 8 == 6:
            uri = f"HTTP://WWW.site{(i - 2) % 7}.example:80/page/{i - 2}"
        if i % 4 == 3:
            payload = f"GET /page/{i} HTTP/1.1\r\nHost: site{i % 7}.example\r\n\r\n"
            wtype = "request"
        else:
            if html_bodies:
                body = (
                    f"<html><head><title>Page {i}</title>"
                    f"<script>var x={i};</script></head>"
                    f"<body><h1>Page {i}</h1>"
                    f"<p>text {i} alpha &amp; beta</p>"
                )
                if i % 5 == 0:
                    body += f"<p>extra {i}</p>"
                body += "</body></html>"
            else:
                body = (
                    f"doc {i} the value {(i * 13) % 97} of the table is here"
                )
                if i % 5 == 0:
                    body += f"\r\n\r\nsecond paragraph {i}"
            status = "404 Not Found" if i % 6 == 0 else "200 OK"
            payload = (
                f"HTTP/1.1 {status}\r\n"
                "Content-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n"
                "\r\n"
                f"{body}"
            )
            wtype = "response"
        out.append(
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:08d}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
            f"{payload}"
            "\r\n\r\n"
        )
    with open(os.path.join(path, "part-0.warc"), "w", newline="") as f:
        f.write("".join(out))

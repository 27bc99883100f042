"""Crawl-corpus medallion (corpus_pipeline.py)."""

import os

from practicum2_nof1_adhd_bd_spark import corpus_pipeline as cp
from practicum2_nof1_adhd_bd_spark.sources import warc


def test_bronze_canonicalizes_respelled_recrawls(spark, tmp_path):
    wd = os.path.join(str(tmp_path), "warc")
    warc.synthesize_warc(wd, 48, html_bodies=True)
    bronze = cp.build_crawl_bronze(spark, wd, str(tmp_path))
    b = {r["doc_id"]: r for r in spark.read.parquet(bronze).collect()}
    # record 6 is the respelled recrawl of page 4: raw URI differs, the
    # canonical URL and canonical host must equal page 4's
    assert b[6]["target_uri"] == "HTTP://WWW.site4.example:80/page/4"
    assert b[6]["canonical_url"] == b[4]["canonical_url"]
    assert b[6]["canonical_host"] == "site4.example"


def test_silver_screens_dedups_and_extracts(spark, tmp_path):
    wd = os.path.join(str(tmp_path), "warc")
    warc.synthesize_warc(wd, 48, html_bodies=True)
    bronze = cp.build_crawl_bronze(spark, wd, str(tmp_path))
    blocked = spark.createDataFrame([("site0.example",)], "host string")
    silver = cp.build_crawl_silver(spark, bronze, str(tmp_path), blocked)
    s = {r["doc_id"]: r for r in spark.read.parquet(silver).collect()}
    assert all(r["host"] != "site0.example" for r in s.values())  # blocklist
    assert 4 in s and 6 not in s  # URL dedup: min record wins
    assert 0 not in s and 6 not in s  # i%6==0 are HTTP 404
    # HTML -> line-structured text with entities decoded
    assert s[4]["text"] == "Page 4\nPage 4\ntext 4 alpha & beta"
    assert s[5]["text"].endswith("extra 5")
    assert s[4]["n_chars"] == len(s[4]["text"])


def test_gold_packs_and_manifest_is_rebuild_stable(spark, tmp_path):
    """Gold = packing offsets + the provenance manifest. The manifest is
    the re-entrancy receipt: rebuilding gold from the SAME silver must
    reproduce (n_rows, content_digest) bit-for-bit."""
    wd = os.path.join(str(tmp_path), "warc")
    warc.synthesize_warc(wd, 48, html_bodies=True)
    bronze = cp.build_crawl_bronze(spark, wd, str(tmp_path))
    blocked = spark.createDataFrame([("site0.example",)], "host string")
    silver = cp.build_crawl_silver(spark, bronze, str(tmp_path), blocked)
    gold = cp.build_crawl_gold(spark, silver, str(tmp_path), budget=8)
    packed = {r["doc_id"]: r for r in spark.read.parquet(gold["packed"]).collect()}
    docs = {r["doc_id"]: r for r in spark.read.parquet(silver).collect()}
    assert set(packed) == set(docs)
    # offsets tile the token stream in doc_id order with no gaps
    ordered = [packed[i] for i in sorted(packed)]
    run = 0
    for r in ordered:
        assert r["start_offset"] == run
        run += r["n_tokens"]
    m1 = sorted(
        tuple(r) for r in spark.read.parquet(gold["manifest"]).collect()
    )
    gold2 = cp.build_crawl_gold(spark, silver, str(tmp_path), budget=8)
    m2 = sorted(
        tuple(r) for r in spark.read.parquet(gold2["manifest"]).collect()
    )
    assert m1 == m2 and len(m1) == 2


def test_corpus_cli_runs_all_layers(spark, tmp_path):
    from practicum2_nof1_adhd_bd_spark.__main__ import main

    wd = os.path.join(str(tmp_path), "warc")
    warc.synthesize_warc(wd, 48, html_bodies=True)
    out = os.path.join(str(tmp_path), "out")
    rc = main(
        ["corpus", "--warc-dir", wd, "--out", out,
         "--blocked", "site0.example,site3.example"]
    )
    assert rc == 0
    for layer in ("bronze/responses", "silver/docs", "gold/packed",
                  "gold/manifest"):
        assert spark.read.parquet(os.path.join(out, layer)).count() > 0
